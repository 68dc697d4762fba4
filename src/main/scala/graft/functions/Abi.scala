package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Schema-driven ABI event decoding — the Spark twin of the reference's
  * `abi.MustNewEvent(...)` + `ParseLog` surface (ref `README.md:28-34`
  * declares a 5-field `DepositEvent`; `README.md:95-104` decodes its
  * payloads). The reference delegates to go-web3's abi package; here the
  * decoder COMPILES the event schema into a tree of built-in Spark
  * expressions (`substring`/`hex`/`conv`/`decode`), so:
  *
  *  - decoding inlines into whole-stage codegen — no UDF boxing, no
  *    per-row interpretation;
  *  - the head/tail offset walk happens inside one projection — static
  *    fields are fixed-offset slices Catalyst constant-folds, dynamic
  *    fields read their pointer + length from the blob at runtime;
  *  - the semantics are hex-slice-expressible ANSI SQL, so the DuckDB
  *    oracle can verify decoded values exactly (`decode_abi`).
  *
  * ABI layout (Solidity contract ABI, public spec): event data is a
  * sequence of 32-byte words ("slots"), one per non-indexed parameter.
  * Static types live in their slot (right-aligned numbers, left-aligned
  * `bytesN`); dynamic types (`bytes`, `string`) put a byte OFFSET in the
  * slot, pointing at a `[32-byte length][payload padded to 32]` tail.
  *
  * Type mapping (documented bounds, matching the reference's use):
  *  - `uint8..uint64`  → LONG. Values ≥ 2^63 overflow Spark's signed long
  *    (ANSI cast error) — decode those as `uint256` instead.
  *  - `bool`           → BOOLEAN
  *  - `address`        → lowercase 40-hex STRING (no 0x prefix)
  *  - `bytes1..bytes32`→ lowercase hex STRING (left-aligned slice)
  *  - `uint128/uint256/int256` → lowercase 64-hex STRING of the raw slot
  *    (lossless; callers convert as needed — a long can't hold it)
  *  - `bytes`          → BINARY (dynamic)
  *  - `string`         → STRING (dynamic, UTF-8)
  *
  * `indexed` parameters are carried in topics, not data (same as the
  * reference's event filters); they are parsed but skipped by [[decode]].
  */
object Abi {

  final case class Field(name: String, typ: String, indexed: Boolean)

  final case class Event(name: String, fields: Seq[Field]) {
    /** Canonical signature (all params, indexed included) — the keccak
      * preimage of topic0.
      */
    def canonicalSignature: String =
      s"$name(${fields.map(_.typ).mkString(",")})"
    /** Parameters decoded from the data blob (non-indexed only). */
    def dataFields: Seq[Field] = fields.filterNot(_.indexed)
  }

  /** Parse a human-readable event signature, whitespace-tolerant — the
    * same shape the reference feeds `abi.MustNewEvent` (multi-line
    * `DepositEvent(bytes pubkey, ...)`). `indexed` between type and name
    * is accepted.
    */
  def parseEvent(sig: String): Event = {
    val s = sig.trim
    val open = s.indexOf('(')
    require(open > 0 && s.endsWith(")"), s"malformed event signature: $sig")
    val name = s.substring(0, open).trim
    val body = s.substring(open + 1, s.length - 1).trim
    val fields =
      if (body.isEmpty) Seq.empty[Field]
      else body.split(",").toSeq.map { p =>
        p.trim.split("\\s+").toSeq match {
          case Seq(t, n)            => Field(n, t, indexed = false)
          case Seq(t, "indexed", n) => Field(n, t, indexed = true)
          case _ => throw new IllegalArgumentException(
            s"malformed parameter '${p.trim}' in: $sig")
        }
      }
    require(fields.map(_.name).distinct.length == fields.length,
      s"duplicate parameter names in: $sig")
    Event(name, fields)
  }

  /** topic0 of an event — keccak256 of the canonical signature (the P3
    * signature-match key, ref `README.md:28-34`).
    */
  def topic0(sig: String): Column =
    EthFunctions.keccak256(lit(parseEvent(sig).canonicalSignature))

  /** Big-endian u64 from the LAST 8 bytes of the 32-byte word at 0-based
    * byte offset `off` — how every right-aligned numeric ≤64 bits is read.
    * `substr` positions are 1-based, hence the +25 (= 24 pad bytes + 1).
    */
  private def wordU64(data: Column, off: Column): Column =
    conv(hex(data.substr(off + lit(25L), lit(8L))), 16, 10).cast("long")

  /** Decode ONE field of type `typ` whose head slot starts at 0-based byte
    * offset `off`.
    */
  private def decodeField(data: Column, off: Column, typ: String): Column =
    typ match {
      case "bool" => wordU64(data, off) =!= 0L
      case "address" => lower(hex(data.substr(off + lit(13L), lit(20L))))
      case "bytes" =>
        val p = wordU64(data, off) // tail pointer (byte offset into data)
        data.substr(p + lit(33L), wordU64(data, p))
      case "string" =>
        val p = wordU64(data, off)
        // qualified: our own decode(Column, String) shadows functions.decode
        org.apache.spark.sql.functions.decode(
          data.substr(p + lit(33L), wordU64(data, p)), "UTF-8")
      case UintN(n) if n.toInt <= 64 => wordU64(data, off)
      case "uint128" | "uint256" | "int256" =>
        lower(hex(data.substr(off + lit(1L), lit(32L))))
      // static bytesN is LEFT-aligned in its slot; only bytes1..bytes32
      // exist in the ABI — a wider N would silently slice into the NEXT
      // field's slot, so reject it at decode-compile time
      case BytesN(n) if n.toInt >= 1 && n.toInt <= 32 =>
        lower(hex(data.substr(off + lit(1L), lit(n.toLong))))
      case other => throw new IllegalArgumentException(
        s"unsupported ABI type: $other")
    }

  private val UintN = "uint(8|16|24|32|40|48|56|64)".r
  private val BytesN = "bytes([0-9]+)".r

  /** Decode an ABI event data blob into a typed struct — one struct field
    * per non-indexed parameter, named as in the signature.
    *
    * {{{
    * df.select(Abi.decode(col("data"),
    *   "Transfer(address indexed from, address indexed to, uint64 value)")
    *   .as("ev")).select("ev.value")
    * }}}
    */
  def decode(data: Column, sig: String): Column = {
    val ev = parseEvent(sig)
    require(ev.dataFields.nonEmpty, s"no non-indexed parameters in: $sig")
    val cols = ev.dataFields.zipWithIndex.map { case (f, i) =>
      decodeField(data, lit(i * 32L), f.typ).as(f.name)
    }
    struct(cols: _*)
  }

  /** Decode the INDEXED parameters from the topics array — the other half
    * of the reference's `ParseLog` (go-web3 reads indexed values out of
    * `log.Topics[1..]`). Topic k+1 carries the k-th indexed parameter as
    * one 32-byte word (64 hex chars, optional 0x prefix):
    *
    *  - static types decode exactly like a head slot (address right-
    *    aligned, numbers big-endian, `bool` last byte);
    *  - dynamic indexed types (`bytes`/`string`) are stored as their
    *    KECCAK HASH per the ABI spec — the value is unrecoverable, so they
    *    decode to the raw 64-hex string (callers can equality-match it
    *    against `keccak256` of a candidate value).
    */
  def decodeTopics(topics: Column, sig: String): Column = {
    val ev = parseEvent(sig)
    val indexed = ev.fields.filter(_.indexed)
    require(indexed.nonEmpty, s"no indexed parameters in: $sig")
    val cols = indexed.zipWithIndex.map { case (f, i) =>
      // null-safe `get` (0-based), NOT element_at: under ANSI mode (Spark 4
      // default) element_at THROWS on a short topics array, killing the
      // whole job on one malformed log — same contract as LogOps.filterTopic
      val word = lower(regexp_replace(get(topics, lit(i + 1)), "^0[xX]", ""))
      val c = f.typ match {
        case "bool" => conv(word.substr(lit(49), lit(16)), 16, 10)
          .cast("long") =!= 0L
        case "address" => word.substr(lit(25), lit(40))
        case UintN(n) if n.toInt <= 64 =>
          conv(word.substr(lit(49), lit(16)), 16, 10).cast("long")
        case BytesN(n) if n.toInt >= 1 && n.toInt <= 32 =>
          word.substr(lit(1), lit(n.toInt * 2))
        // uint256/int256 + hashed dynamic types: the raw 64-hex word
        case "uint128" | "uint256" | "int256" | "bytes" | "string" => word
        case other => throw new IllegalArgumentException(
          s"unsupported ABI type: $other")
      }
      c.as(f.name)
    }
    struct(cols: _*)
  }
}

package graft.model

/** Core data model of the engine — the Spark-native re-expression of the
  * reference's four data abstractions (see SURVEY.md §1.1):
  *
  *  - [[Log]]:          the fact record (ref: `store/postgresql/postgresql_store.go:208-217`)
  *  - [[BlockHeader]]:  the chain header (ref: `tracker.go:237-240`)
  *  - [[FilterConfig]]: the standing query (ref: `tracker.go:39-45`)
  *  - [[TrackerEvent]]: the CDC output with retractions (ref: `tracker.go:841-846`)
  *
  * These are plain case classes so Spark derives `Encoder`s via
  * `import spark.implicits._` and the whole pipeline stays in the
  * Dataset/Tungsten world (no Kryo, no RDD boxing).
  */

/** One event log. `indx` is the per-filter monotonic append index assigned by
  * the store (ref: `postgresql_store.go:130`). Block numbers are Go `uint64`
  * in the reference; Spark `LongType` is signed — real chain heights are far
  * below 2^63 so the narrowing is safe (documented in SURVEY.md §7.6).
  */
final case class Log(
    indx: Long,
    txIndex: Long,
    txHash: String,
    blockNum: Long,
    blockHash: String,
    address: String,
    topics: Seq[String],
    data: Array[Byte]
)

/** Chain header; the fields the reference observably uses
  * (ref: `tracker.go:291-314, 627, 639-654`) plus `difficulty`, which the
  * reference serializes into the checkpointed block (`tracker.go:237-240`,
  * defaulting nil to 0) — carried here for checkpoint parity. BigInt like
  * the reference's `big.Int` (chain difficulty exceeds uint64); Spark
  * encodes it as Decimal(38,0), ample for any real chain.
  *
  * Compatibility note: this type participates in STREAMING STATE
  * (EventStream.Backlog / ReorgProcessor), so adding the field changed the
  * state schema — a stream restarted from a checkpoint written before the
  * field existed fails the state-schema check and needs a fresh checkpoint
  * (one-time migration). The KV checkpoint strings ARE backward-compatible
  * (Syncer.parseHeader defaults missing difficulty to 0, like the
  * reference's nil → 0).
  */
final case class BlockHeader(
    number: Long,
    hash: String,
    parentHash: String,
    difficulty: BigInt = BigInt(0)
)

/** A standing query: address OR-membership + positional topics with `None` as
  * wildcard (ref: `tracker.go:39-45`). `hash` (SHA-256 over addresses +
  * topics, `None` → "empty"; ref: `tracker.go:47-60`) namespaces all
  * persisted state: the log table partition, the filter registry row and the
  * checkpoint key.
  */
final case class FilterConfig(
    addresses: Seq[String] = Nil,
    topics: Seq[Option[String]] = Nil,
    start: Long = 0L
) {
  /** Injective framing of the filter: every element carries a kind tag and
    * a length prefix, so distinct configs can never serialize identically.
    * The reference digests a bare concatenation (`tracker.go:47-60`), under
    * which ["ab"] collides with ["a","b"] and a `None` wildcard collides
    * with the literal topic "empty" — colliding filters would share a log
    * table, registry row and checkpoint. Deliberate (documented) deviation:
    * same scheme shape, unambiguous encoding. NOTE: this is identity
    * scheme v2 — stores written under the v1 (bare-concat) hashes resolve
    * to different directories/keys; migrating an existing store means
    * renaming its `filter_hash=<v1>` dir and `*_<v1>` KV keys to the v2
    * hash (no in-repo stores predate v2).
    */
  def canonical: String = {
    val sb = new StringBuilder
    addresses.foreach(a =>
      sb.append('a').append(a.length).append(':').append(a).append(';'))
    topics.foreach {
      case Some(t) =>
        sb.append('t').append(t.length).append(':').append(t).append(';')
      case None => sb.append("w;")
    }
    sb.toString
  }

  /** SHA-256 filter identity over [[canonical]], ref `tracker.go:47-60`. */
  def hash: String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(canonical.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }
}

/** CDC output row: reorgs retract previously-emitted logs (`action = "del"`,
  * emitted oldest-first — removeLogs collects newest-first but revertLogs
  * reverses before emitting; ref `tracker.go:756-761, 786-795`), canonical logs
  * are appended (`action = "add"`). Structured Streaming sinks don't natively
  * retract, so the engine emits an explicit action column (SURVEY.md §1.1d).
  */
final case class LogAction(action: String, log: Log)

/** Header-stream event (ref `tracker.go:848-853`). */
final case class BlockEvent(added: Seq[BlockHeader], removed: Seq[BlockHeader])

package graft.queries

/** DuckDB oracle SQL for the pipeline-layer queries — a pure move out of
  * [[PipelineQueries]] (round-10 verdict's maintainability item: the query
  * definitions and their 1,100-line oracle map no longer share one file).
  * Entry semantics, names and text are unchanged; [[PipelineQueries.oracle]]
  * aliases this map, so `SparkEntry.oracleSql` composition is untouched.
  */
object PipelineOracles {

  val sql: Map[String, String] = Map(
    // partial oracles for the sequential/solver-dependent operators: the
    // assignment/basis itself has no SQL twin, but per-shard accounting,
    // capacity/layout booleans, identity covariance and quota arithmetic
    // are oracle-constant — a violated invariant flips a value and the
    // driver's hash goes red
    "doc_pack_bfd_check" ->
      """SELECT lang AS shard,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
        |   AS total_tokens,
        | TRUE AS ok_capacity, TRUE AS ok_layout, TRUE AS ok_oversize
        |FROM documents GROUP BY lang ORDER BY shard""".stripMargin,
    "embed_whiten_check" ->
      """SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
        | CAST(CASE WHEN i = j THEN 1.0 ELSE 0.0 END AS DOUBLE) AS cov
        |FROM (VALUES (1,1),(1,2),(1,3),(1,4),(2,2),(2,3),(2,4),
        | (3,3),(3,4),(4,4)) AS t(i, j)
        |ORDER BY i, j""".stripMargin,
    "sample_coverage_check" ->
      """SELECT
        | CAST(LEAST(200, (SELECT count(*) FROM embeddings)) AS BIGINT)
        |   AS total_taken,
        | TRUE AS ok_within_size, TRUE AS ok_balanced""".stripMargin,
    // the ingest round-trips must reproduce the parquet originals
    // exactly — the oracle aggregates the source table directly
    "ingest_jsonl" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars,
        | CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
        | max(sha256(concat(CAST(doc_id AS VARCHAR), text))) AS max_row_sha
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "ingest_csv" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars,
        | CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
        | max(sha256(concat(CAST(doc_id AS VARCHAR), text))) AS max_row_sha
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "contamination_bloom_check" ->
      """WITH sp AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM sp),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
        |hit AS (SELECT DISTINCT doc_id FROM sh
        |        WHERE doc_id % 10 <> 0 AND s IN (SELECT s FROM ev))
        |SELECT
        | CAST((SELECT count(*) FROM documents WHERE doc_id % 10 <> 0)
        |   AS BIGINT) AS n_train_docs,
        | CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_exact_contaminated,
        | TRUE AS ok_no_false_negatives""".stripMargin,
    // fingerprint-tier check twins: DuckDB reproduces the invariant
    // values (identical-key pair counts, the exact tier's pair count,
    // the synth corpus's keeper count) — the LSH/fingerprint guarantees
    // themselves are Spark-verified booleans, constant TRUE
    "dedup_minhash_check" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |k AS (SELECT doc_id, string_agg(s, chr(1) ORDER BY s) AS k
        |      FROM sh0 GROUP BY doc_id),
        |g AS (SELECT k, count(*) AS g FROM k GROUP BY k),
        |sh AS (SELECT doc_id, s FROM sh0
        |       QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        CAST(count(*) AS BIGINT) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |e AS (SELECT count(*) AS ne FROM p
        |      JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
        |      WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) >= 0.3)
        |SELECT CAST((SELECT COALESCE(SUM(g * (g - 1) // 2), 0) FROM g) AS BIGINT)
        |   AS n_identical_pairs,
        | CAST((SELECT ne FROM e) AS BIGINT) AS n_exact_pairs,
        | TRUE AS ok_identical_found, TRUE AS ok_identical_est_one,
        | TRUE AS ok_canonical""".stripMargin,
    "dedup_simhash_check" ->
      """SELECT CAST(COALESCE(SUM(g * (g - 1) // 2), 0) AS BIGINT)
        |   AS n_identical_pairs,
        | TRUE AS ok_identical_found, TRUE AS ok_identical_zero,
        | TRUE AS ok_within_distance, TRUE AS ok_canonical
        |FROM (SELECT count(*) AS g FROM documents
        |      WHERE text IS NOT NULL GROUP BY text) t""".stripMargin,
    "dedup_media_check" ->
      """SELECT CAST((SELECT count(DISTINCT text) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(DISTINCT text) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media_kept,
        | TRUE AS ok_bands_agree, TRUE AS ok_within_distance,
        | TRUE AS ok_canonical""".stripMargin,
    "dedup_audio_check" ->
      """SELECT CAST((SELECT count(DISTINCT text) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(DISTINCT text) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media_kept,
        | TRUE AS ok_bands_agree, TRUE AS ok_within_distance,
        | TRUE AS ok_canonical""".stripMargin,
    "dedup_video_check" ->
      """SELECT CAST((SELECT count(DISTINCT text) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(DISTINCT text) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media_kept,
        | TRUE AS ok_bands_agree, TRUE AS ok_within_distance,
        | TRUE AS ok_canonical""".stripMargin,
    "knn_join_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors,
        | TRUE AS ok_cosine_exact, TRUE AS ok_no_self,
        | TRUE AS ok_k_bound, TRUE AS ok_rnk_dense""".stripMargin,
    "sim_search_lsh_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_cosine_exact, TRUE AS ok_k_bound,
        | TRUE AS ok_self_found""".stripMargin,
    "sim_search_batch_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_cosine_exact, TRUE AS ok_all_queries,
        | TRUE AS ok_k_bound, TRUE AS ok_ranks_dense,
        | TRUE AS ok_self_found""".stripMargin,
    "sim_search_batch_ivf_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_cosine_exact, TRUE AS ok_all_queries,
        | TRUE AS ok_k_bound, TRUE AS ok_ranks_dense,
        | TRUE AS ok_self_found""".stripMargin,
    "sim_search_batch_pq_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_cosine_exact, TRUE AS ok_all_queries,
        | TRUE AS ok_k_bound, TRUE AS ok_ranks_dense,
        | TRUE AS ok_self_found""".stripMargin,
    "sim_search_incremental_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_cosine_exact, TRUE AS ok_k_bound,
        | TRUE AS ok_self_found, TRUE AS ok_matches_oneshot""".stripMargin,
    "sim_search_ivf_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_cosine_exact, TRUE AS ok_k_bound,
        | TRUE AS ok_self_found""".stripMargin,
    "sim_search_pq_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_cosine_exact, TRUE AS ok_k_bound,
        | TRUE AS ok_self_found""".stripMargin,
    "dedup_embedding_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT)
        |   AS n_vectors, TRUE AS ok_no_false_positives,
        | TRUE AS ok_canonical""".stripMargin,
    "dedup_semantic_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id % 4 = 0)
        |   AS BIGINT) AS n_planted, TRUE AS ok_pairs_planted_form,
        | TRUE AS ok_min_cosine, TRUE AS ok_within_count""".stripMargin,
    "media_phash_check" ->
      """SELECT CAST((SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media,
        | TRUE AS ok_identical_text_same_hash""".stripMargin,
    "media_resize_check" ->
      """SELECT CAST((SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media,
        | TRUE AS ok_all_fingerprinted""".stripMargin,
    "media_keyframes_check" ->
      """SELECT CAST((SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media,
        | TRUE AS ok_first_frame_kept, TRUE AS ok_bounds""".stripMargin,
    "media_audio_fp_check" ->
      """SELECT CAST((SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media,
        | TRUE AS ok_identical_text_same_hash""".stripMargin,
    "media_video_fp_check" ->
      """SELECT CAST((SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL) +
        | (SELECT count(*) FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0)
        |   AS BIGINT) AS n_media,
        | TRUE AS ok_identical_text_same_hash""".stripMargin,
    "dedup_semantic_purge_check" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_base,
        | CAST((SELECT count(*) FROM embeddings WHERE vec_id % 4 = 0)
        |   AS BIGINT) AS n_planted,
        | TRUE AS ok_members_ge1, TRUE AS ok_partition,
        | TRUE AS ok_all_base_kept, TRUE AS ok_survivor_bounds""".stripMargin,
    "unigram_sample_check" ->
      """SELECT doc_id,
        | array_to_string(list_filter(string_split(text, ' '),
        |   x -> x <> ''), '') AS detok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "unigram_pieces_check" ->
      """SELECT CAST(count(DISTINCT c) AS BIGINT) AS n_corpus_chars,
        | TRUE AS ok_distinct_pieces, TRUE AS ok_piece_len,
        | TRUE AS ok_logp_negative, TRUE AS ok_vocab_bound,
        | TRUE AS ok_char_coverage
        |FROM (SELECT unnest(regexp_split_to_array(replace(text, ' ', ''),
        |        '')) AS c
        |      FROM documents WHERE text IS NOT NULL) t
        |WHERE c <> ''""".stripMargin,
    "bpe_fertility_check" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(list_filter(string_split(text, ' '),
        |   x -> x <> ''))) AS BIGINT) AS n_words,
        | CAST(sum(length(text)) AS BIGINT) AS n_chars,
        | TRUE AS ok_fertility_ge1, TRUE AS ok_nonempty_tokenized
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // tokenization losslessness: detok(tokens) must equal the word
    // sequence (BPE, spaces restored from </w>) or the space-free char
    // stream (unigram) — both computable from the raw text
    "bpe_encode_check" ->
      """SELECT doc_id,
        | array_to_string(list_filter(string_split(text, ' '),
        |   x -> x <> ''), ' ') AS detok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "unigram_encode_check" ->
      """SELECT doc_id,
        | array_to_string(list_filter(string_split(text, ' '),
        |   x -> x <> ''), '') AS detok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "embed_pca_check" ->
      """SELECT CAST(4 AS INT) AS n_components, TRUE AS ok_orthonormal,
        | TRUE AS ok_uncorrelated, TRUE AS ok_ordered""".stripMargin,
    "dsir_select_check" ->
      """SELECT
        | CAST(LEAST(100, (SELECT count(*) FROM documents)) AS BIGINT)
        |   AS n_selected,
        | CAST(LEAST(100, (SELECT count(*) FROM documents)) AS BIGINT)
        |   AS n_distinct,
        | TRUE AS ok_finite, TRUE AS ok_domain_shift""".stripMargin,
    "quality_lr_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | TRUE AS ok_unit_scores, TRUE AS ok_agree_chance
        |FROM documents""".stripMargin,
    // token counts are exact integers; p/sw/w/epochs replay the identical
    // IEEE op sequence (divide, sqrt, divide) and the Σ p^α normalizer is
    // the source-ordered fold, so every double is bit-identical
    "mix_weights" ->
      """WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM t),
        |sh AS (SELECT source, n_docs, n_tokens,
        |  CAST(n_tokens AS DOUBLE) / CAST(tot.t AS DOUBLE) AS p,
        |  sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot.t AS DOUBLE)) AS sw
        | FROM t, tot),
        |s AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |   list(sw ORDER BY source)), (a, b) -> a + b) AS s FROM sh)
        |SELECT source, n_docs, n_tokens, p, sw / s.s AS w,
        | (sw / s.s) / p AS epochs
        |FROM sh, s ORDER BY source""".stripMargin,
    // same blob construction, decoded by independent hex-slice arithmetic:
    // slot k occupies hex chars 64k+1..64k+64; right-aligned u64 = last 16
    // chars of its slot; the dynamic string is found via its offset word
    "decode_abi" ->
      """WITH b AS (
        | SELECT event_id,
        |  concat(
        |   lpad(lower(hex(user_id)), 64, '0'),
        |   lpad(lower(hex(event_id // 7)), 64, '0'),
        |   lpad(lower(hex(event_id % 2)), 64, '0'),
        |   lpad('80', 64, '0'),
        |   lpad(lower(hex(strlen(event_type))), 64, '0'),
        |   rpad(lower(hex(event_type)), 64, '0')) AS h
        | FROM events)
        |SELECT event_id,
        | substr(h, 25, 40) AS from_addr,
        | CAST(concat('0x', substr(h, 113, 16)) AS BIGINT) AS amount,
        | CAST(concat('0x', substr(h, 177, 16)) AS BIGINT) <> 0 AS flag,
        | decode(from_hex(substr(h,
        |   2 * CAST(concat('0x', substr(h, 241, 16)) AS BIGINT) + 65,
        |   2 * CAST(concat('0x', substr(h,
        |     2 * CAST(concat('0x', substr(h, 241, 16)) AS BIGINT) + 49,
        |     16)) AS BIGINT)))) AS memo
        |FROM b ORDER BY event_id""".stripMargin,
    "embed_centroid" ->
      """WITH e AS (
        | SELECT label, u.s.pos AS pos, vec_id, u.s.x AS x
        | FROM embeddings,
        |  unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> struct_pack(pos := i - 1, x := CAST(embedding[i] AS DOUBLE)))) AS u(s))
        |SELECT label, pos,
        | list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x ORDER BY vec_id)),
        |   (a, b) -> a + b) / CAST(count(*) AS BIGINT) AS mean
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_cluster" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |sh AS (SELECT doc_id, s FROM sh0
        |       QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |cand AS (SELECT id_a, id_b FROM p
        |  JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) >= 0.5),
        |e AS (SELECT id_a AS src, id_b AS dst FROM cand
        |      UNION ALL SELECT id_b, id_a FROM cand),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN e ON e.src = r.node),
        |lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY 1),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
        |       FROM lab GROUP BY 1)
        |SELECT node AS doc_id, cluster_id, n_members
        |FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin,
    "doc_boilerplate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        | CAST(sum(CASE WHEN df.df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        | CAST(sum(CASE WHEN df.df >= 5 THEN 1 ELSE 0 END) AS DOUBLE) /
        |   CAST(count(*) AS DOUBLE) AS boiler_ratio
        |FROM sh JOIN df USING (s) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "contamination" ->
      """WITH sp AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM sp),
        |base AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 = 0),
        |ev AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 <> 0),
        |n AS (SELECT doc_id, count(*) AS n_shingles FROM ev GROUP BY 1),
        |m AS (SELECT doc_id, count(*) AS n_matched FROM ev
        |      WHERE s IN (SELECT s FROM tr) GROUP BY 1)
        |SELECT base.doc_id,
        | CAST(coalesce(n_shingles, 0) AS BIGINT) AS n_shingles,
        | CAST(coalesce(n_matched, 0) AS BIGINT) AS n_matched,
        | CASE WHEN coalesce(n_shingles, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |  ELSE CAST(coalesce(n_matched, 0) AS DOUBLE) /
        |   CAST(n_shingles AS DOUBLE) END AS contamination_ratio
        |FROM base LEFT JOIN n ON base.doc_id = n.doc_id
        | LEFT JOIN m ON base.doc_id = m.doc_id
        |ORDER BY base.doc_id""".stripMargin,
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        |wa AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
        |        max(c) AS top_c FROM wc GROUP BY 1),
        |sp AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bgr AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |        i -> concat_ws(' ', ws[i], ws[i+1]))) AS s FROM sp),
        |bc AS (SELECT doc_id, s, count(*) AS c FROM bgr GROUP BY 1, 2),
        |ba AS (SELECT doc_id, sum(c) AS n_bi, count(*) AS n_bi_distinct
        |       FROM bc GROUP BY 1)
        |SELECT wa.doc_id, CAST(n_words AS BIGINT) AS n_words,
        | CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)
        |  AS dup_word_ratio,
        | CAST(top_c AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
        | coalesce(CAST(n_bi - n_bi_distinct AS DOUBLE) /
        |  CAST(n_bi AS DOUBLE), CAST(0.0 AS DOUBLE)) AS dup_bigram_ratio
        |FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id
        |ORDER BY wa.doc_id""".stripMargin,
    "pattern_stats" ->
      """SELECT event_id,
        | CAST(len(regexp_extract_all(props, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))
        |  AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(props, 'https?://[a-zA-Z0-9./]+'))
        |  AS BIGINT) AS n_urls,
        | CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_numbers
        |FROM events ORDER BY event_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, rk FROM (
        | SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rk
        | FROM documents)
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    "embed_norm" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        | sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)) AS l2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "zorder_key" ->
      """SELECT event_id,
        | list_reduce(list_transform(range(0, 16), i ->
        |   ((((event_id // 10) >> i) & 1) << (2*i)) +
        |   (((user_id >> i) & 1) << (2*i + 1))),
        |  (a, b) -> a + b) AS zkey
        |FROM events ORDER BY event_id""".stripMargin,
    "media_features" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        | CAST(strlen(text) AS BIGINT) AS n_bytes, sha256(text) AS sha
        |FROM documents ORDER BY media_id""".stripMargin,
    "edit_distance" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |sh AS (SELECT doc_id, s FROM sh0
        |       QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |cand AS (SELECT id_a, id_b FROM p
        |  JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) >= 0.3)
        |SELECT id_a, id_b,
        | CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
        |FROM cand JOIN documents da ON da.doc_id = id_a
        | JOIN documents db ON db.doc_id = id_b
        |ORDER BY id_a, id_b""".stripMargin,
    "tfidf" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
        |df AS (SELECT w, count(*) AS df FROM
        |  (SELECT DISTINCT doc_id, w FROM words) GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (
        | SELECT doc_id, w,
        |  CAST(tf AS DOUBLE) * (nd.n / CAST(df AS DOUBLE)) AS score
        | FROM tf JOIN df USING (w), nd),
        |ranked AS (
        | SELECT doc_id, w, score,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, w) AS BIGINT) AS rnk
        | FROM scored)
        |SELECT doc_id, rnk, w, score FROM ranked WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "ngram_freq" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT unnest(list_transform(range(1, len(ws)),
        |        i -> concat_ws(' ', ws[i], ws[i+1]))) AS s FROM w)
        |SELECT s, CAST(count(*) AS BIGINT) AS n FROM sh
        |GROUP BY s ORDER BY n DESC, s LIMIT 50""".stripMargin,
    "dedup_exact" ->
      """SELECT sha256(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_dups,
        | min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // one row per gram SITE (unnest of the position range — no DISTINCT,
    // unlike the shingle CTEs): a gram repeating inside one doc is two
    // sites. range(1, len-3) = 1-based starts of the len-4 5-grams; empty
    // for docs under 5 words, which therefore drop out of the output on
    // both engines
    "dedup_span" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |gr AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4]))) AS g
        |       FROM w),
        |c AS (SELECT g, count(*) AS sites FROM gr GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        | CAST(sum(CASE WHEN sites >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        | CAST(sum(CASE WHEN sites >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
        |  CAST(count(*) AS DOUBLE) AS dup_frac
        |FROM gr JOIN c USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_ngram" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |sh AS (SELECT doc_id, s FROM sh0
        |       QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, inter,
        | CAST(na.n + nb.n - inter AS BIGINT) AS "union",
        | CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) AS jaccard
        |FROM p JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    // the incremental tier's oracle is the EXACT cross-partition pair
    // tier (batch = doc_id % 10 == 0 vs the rest) — same shingle
    // construction as dedup_ngram's oracle minus the df cap (the
    // declared query's flood protection is the probe's maxBucket; its
    // verify is candidate-restricted and uncapped), restricted to pairs
    // that straddle the batch/corpus split (candidatesAgainstIndex only
    // emits pairs with exactly one new-batch side; the index holds the
    // corpus)
    "dedup_incremental" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      WHERE (a.doc_id % 10 = 0) <> (b.doc_id % 10 = 0)
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, inter,
        | CAST(na.n + nb.n - inter AS BIGINT) AS "union",
        | CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) AS jaccard
        |FROM p JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "sim_search" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |d AS (SELECT vec_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, len(embedding) + 1),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))),
        |    (a, b) -> a + b) AS dot,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b) AS na,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(qe,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b) AS nq
        | FROM embeddings, q)
        |SELECT vec_id, dot / (sqrt(na) * sqrt(nq)) AS cosine
        |FROM d ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_stop AS BIGINT) AS n_stop,
        | CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
        | (CAST(n_chars AS DOUBLE) - (CAST(n_tokens AS DOUBLE) - 1)) /
        |  CAST(n_tokens AS DOUBLE) AS avg_word_len
        |FROM (
        | SELECT doc_id, length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_filter(string_split(text, ' '), w -> list_contains(
        |   CASE lang
        |    WHEN 'en' THEN ['the','a','of','and','in','to','is','it','that','for']
        |    WHEN 'fr' THEN ['le','la','les','de','des','et','en','un','une','est']
        |    WHEN 'de' THEN ['der','die','das','und','ist','ein','eine','nicht','mit','von']
        |    WHEN 'es' THEN ['el','los','las','de','y','en','un','una','es','que']
        |    ELSE ['the','a','of','and','in'] END, w))) AS n_stop
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      """WITH s AS (
        | SELECT doc_id, lang, text,
        |  len(list_intersect(string_split(text, ' '),
        |   ['the','a','of','and','in','to','is','it','that','for'])) AS s_en,
        |  len(list_intersect(string_split(text, ' '),
        |   ['le','la','les','de','des','et','en','un','une','est'])) AS s_fr,
        |  len(list_intersect(string_split(text, ' '),
        |   ['der','die','das','und','ist','ein','eine','nicht','mit','von'])) AS s_de,
        |  len(list_intersect(string_split(text, ' '),
        |   ['el','los','las','de','y','en','un','una','es','que'])) AS s_es
        | FROM documents),
        |g AS (
        | SELECT doc_id, lang,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |   WHEN s_en > 0 AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_es
        |    THEN 'en'
        |   WHEN s_fr > 0 AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
        |   WHEN s_de > 0 AND s_de >= s_es THEN 'de'
        |   WHEN s_es > 0 THEN 'es'
        |   ELSE 'xx' END AS guess
        | FROM s)
        |SELECT doc_id, lang, guess, guess = lang AS agree
        |FROM g ORDER BY doc_id""".stripMargin,
    // same ws-token expression as token_count; per-lang running sums with
    // the default RANGE frame (doc_id unique ⇒ identical), integral div/mod
    "doc_pack" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, lang, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS endsum
        | FROM t)
        |SELECT doc_id, lang, n_tokens,
        | CAST((endsum - n_tokens) // 512 AS BIGINT) AS pack_id,
        | CAST((endsum - n_tokens) % 512 AS BIGINT) AS pack_offset,
        | CAST(CASE WHEN n_tokens > 0
        |            AND (endsum - 1) // 512 > (endsum - n_tokens) // 512
        |           THEN 1 ELSE 0 END AS BIGINT) AS spans_cut
        |FROM c ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
        | CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
        |   w -> length(w) * 256 + ascii(w))),
        |  (h, v) -> (h * 31 + v) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "quality_score" ->
      """SELECT doc_id,
        | ((CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN CAST(1.0 AS DOUBLE)
        |     ELSE CAST(0.2 AS DOUBLE) END * CAST(0.4 AS DOUBLE)) +
        |  (CASE WHEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |     BETWEEN 0.01 AND 0.6 THEN CAST(1.0 AS DOUBLE)
        |     ELSE CAST(0.5 AS DOUBLE) END * CAST(0.3 AS DOUBLE)) +
        |  (CASE WHEN CAST(n_short AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.3
        |     THEN CAST(1.0 AS DOUBLE)
        |     ELSE CAST(0.4 AS DOUBLE) END * CAST(0.3 AS DOUBLE))) AS quality
        |FROM (
        | SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  len(list_filter(string_split(text, ' '),
        |   w -> w = 'the' OR w = 'a' OR w = 'of' OR w = 'and' OR w = 'in')) AS n_stop,
        |  len(list_filter(string_split(text, ' '), w -> length(w) <= 1)) AS n_short
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // exact knn self-join: same ordered-fold dot product as sim_search,
    // pair-joined within label blocks, ranked per query id
    "knn_exact" ->
      """WITH n AS (
        | SELECT vec_id, label, embedding,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |   (a, b) -> a + b)) AS nrm
        | FROM embeddings),
        |p AS (
        | SELECT a.vec_id AS id, b.vec_id AS neighbor,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, len(a.embedding) + 1),
        |     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
        |   (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
        | FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |SELECT id, neighbor, cosine, rnk FROM (
        | SELECT id, neighbor, cosine,
        |  CAST(row_number() OVER (PARTITION BY id
        |   ORDER BY cosine DESC, neighbor) AS BIGINT) AS rnk
        | FROM p)
        |WHERE rnk <= 5 ORDER BY id, rnk""".stripMargin,
    "doc_chunk" ->
      """SELECT doc_id, CAST(off // 150 AS BIGINT) AS chunk_idx,
        | substring(text, CAST(off + 1 AS INT), 200) AS chunk
        |FROM (SELECT doc_id, text,
        |  unnest(range(0, CAST(length(text) AS BIGINT), 150)) AS off
        | FROM documents WHERE length(text) > 0)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "pii_scrub" ->
      """SELECT event_id,
        | regexp_replace(regexp_replace(props,
        |   '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
        |  '[0-9]{1,}', '<NUM>', 'g') AS scrubbed,
        | CAST(len(regexp_extract_all(props, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))
        |  + len(regexp_extract_all(regexp_replace(props,
        |     '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '[0-9]{1,}')) AS BIGINT) AS n_redacted
        |FROM events ORDER BY event_id""".stripMargin,
    // same salted-md5 uniform and the same integer thresholds (rate·2⁶⁰)
    // sqrt/divide are IEEE-correctly-rounded, so the computed per-lang
    // threshold matches Spark's bit-for-bit; floor before the BIGINT cast
    // (DuckDB CAST rounds, Spark truncates)
    "sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
        |m AS (SELECT min(cnt) AS cmin FROM c),
        |t AS (SELECT lang,
        |  CAST(floor(sqrt(CAST(cmin AS DOUBLE) / cnt) *
        |             1152921504606846976.0) AS BIGINT) AS thr
        | FROM c, m)
        |SELECT doc_id, lang, source FROM (
        | SELECT doc_id, lang, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'temp1'), 1, 15))::BIGINT AS u
        | FROM documents) JOIN t USING (lang)
        |WHERE u < thr
        |ORDER BY doc_id""".stripMargin,
    "vocab_topk" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
        |      FROM t GROUP BY 1, 2)
        |SELECT lang, tok, n, rk FROM (
        | SELECT lang, tok, n,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok)
        |    AS BIGINT) AS rk
        | FROM c)
        |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    // u is 15 hex chars (< 2^60, non-negative), so DuckDB's % and Spark's
    // pmod agree; ties in the hash order are broken by doc_id on both sides
    "shuffle_global" ->
      """SELECT doc_id, lang, shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY u, doc_id)
        |   AS BIGINT) AS ord
        |FROM (
        | SELECT doc_id, lang,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'shuf1'), 1, 15))::BIGINT AS u,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'shuf1'), 1, 15))::BIGINT % 8 AS shard
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "source_cap" ->
      """SELECT doc_id, source, rk FROM (
        | SELECT doc_id, source,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
        |    AS BIGINT) AS rk
        | FROM (
        |  SELECT doc_id, source,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'cap1'), 1, 15))::BIGINT AS u
        |  FROM documents))
        |WHERE rk <= 15 ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """SELECT doc_id, lang, source FROM (
        | SELECT doc_id, lang, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 15))::BIGINT AS u
        | FROM documents)
        |WHERE u < CASE lang WHEN 'en' THEN 1152921504606846976
        |                    WHEN 'de' THEN 576460752303423488
        |                    WHEN 'fr' THEN 576460752303423488
        |                    WHEN 'es' THEN 288230376151711744
        |                    WHEN 'zh' THEN 288230376151711744
        |                    ELSE 0 END
        |ORDER BY doc_id""".stripMargin,
    // same shingle/cap construction as dedup_ngram; containment divisions
    // are single IEEE ops on identical integer operands
    "dedup_containment" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |sh AS (SELECT doc_id, s FROM sh0
        |       QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT id_a, id_b, inter,
        | CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        | CAST(inter AS DOUBLE) / CAST(na.n AS DOUBLE) AS cont_a,
        | CAST(inter AS DOUBLE) / CAST(nb.n AS DOUBLE) AS cont_b,
        | greatest(CAST(inter AS DOUBLE) / CAST(na.n AS DOUBLE),
        |          CAST(inter AS DOUBLE) / CAST(nb.n AS DOUBLE)) AS containment
        |FROM p JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
        |WHERE greatest(CAST(inter AS DOUBLE) / CAST(na.n AS DOUBLE),
        |               CAST(inter AS DOUBLE) / CAST(nb.n AS DOUBLE)) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "quality_filter" ->
      """SELECT doc_id, n_tokens, stop_ratio, dup_ratio, reason,
        | reason = 'keep' AS keep
        |FROM (
        | SELECT doc_id, n_tokens, stop_ratio, dup_ratio,
        |  CASE WHEN n_tokens < 25 THEN 'too_short'
        |       WHEN stop_ratio < 0.02 THEN 'low_stopword'
        |       WHEN dup_ratio > 0.65 THEN 'repetitive'
        |       ELSE 'keep' END AS reason
        | FROM (
        |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
        |   CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in')))
        |     AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS stop_ratio,
        |   CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) /
        |     CAST(len(ws) AS DOUBLE) AS dup_ratio
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)))
        |ORDER BY doc_id""".stripMargin,
    // same ordered-fold device as embed_centroid: list(val ORDER BY w) +
    // list_reduce ↔ Spark's sort_array(collect_list(struct(w,val))) fold
    "rarity_score" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY 1, 2),
        |cw AS (SELECT w, count(*) AS cw FROM w GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM w),
        |v AS (SELECT doc_id, w, tf,
        |  CAST(tf AS DOUBLE) * (n.n / CAST(cw AS DOUBLE)) AS val
        | FROM tf JOIN cw USING (w), n)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        | list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(val ORDER BY w)),
        |   (a, b) -> a + b) / CAST(sum(tf) AS DOUBLE) AS rarity
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigram model trained on the 90% slice; c1 is the bigram-history
    // count (count of w1 as a bigram start), condp one exact division
    "lm_bigram" ->
      """WITH tr AS (SELECT string_split(text, ' ') AS ws FROM documents
        |  WHERE doc_id % 10 <> 0),
        |bg AS (SELECT u.b.w1 AS w1, u.b.w2 AS w2 FROM tr,
        |  unnest(list_transform(range(1, len(ws)),
        |    i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS u(b)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |  FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1)
        |SELECT w1, w2, c2, c1,
        | CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE) AS condp
        |FROM c2 JOIN c1 USING (w1)
        |ORDER BY c2 DESC, w1, w2 LIMIT 50""".stripMargin,
    // add-1-smoothed per-site probability is one IEEE division of integer
    // operands; the per-doc sum is the same position-ordered
    // list_prepend(0.0) + list_reduce fold as rarity_score. Train bigrams
    // (tbg) reuse the same site expansion, filtered to the 90% slice
    "lm_score" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |bg AS (SELECT doc_id, u.b.pos AS pos, u.b.w1 AS w1, u.b.w2 AS w2
        | FROM d, unnest(list_transform(range(1, len(ws)),
        |   i -> struct_pack(pos := i - 1, w1 := ws[i], w2 := ws[i+1])))
        |   AS u(b)),
        |tbg AS (SELECT w1, w2 FROM bg WHERE doc_id % 10 <> 0),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM tbg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM tbg GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |  (SELECT unnest(ws) AS w FROM d WHERE doc_id % 10 <> 0)),
        |p AS (SELECT doc_id, pos,
        |  CAST(coalesce(c2, 0) + 1 AS DOUBLE) /
        |    CAST(coalesce(c1, 0) + v.v AS DOUBLE) AS p,
        |  CASE WHEN c2 IS NULL THEN 1 ELSE 0 END AS oov
        | FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1), v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        | CAST(sum(oov) AS BIGINT) AS n_oov,
        | list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
        |   (a, b) -> a + b) AS sum_condp
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the same bigram-site expansion as lm_score's oracle; KN terms
    // replay the identical IEEE op sequence (cast→subtract→greatest→
    // divide, multiply→divide→multiply, add) over exact integer counts
    "lm_kn" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |bg AS (SELECT doc_id, u.b.pos AS pos, u.b.w1 AS w1, u.b.w2 AS w2
        | FROM d, unnest(list_transform(range(1, len(ws)),
        |   i -> struct_pack(pos := i - 1, w1 := ws[i], w2 := ws[i+1])))
        |   AS u(b)),
        |tbg AS (SELECT w1, w2 FROM bg WHERE doc_id % 10 <> 0),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM tbg GROUP BY 1, 2),
        |cx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
        |  count(*) AS n1f FROM c2 GROUP BY 1),
        |cc AS (SELECT w2, count(*) AS n1p FROM c2 GROUP BY 1),
        |st AS (SELECT (SELECT count(*) FROM c2) AS t,
        |  (SELECT count(DISTINCT w) FROM
        |    (SELECT unnest(ws) AS w FROM d WHERE doc_id % 10 <> 0)) AS v),
        |pr AS (SELECT doc_id, pos, c2.c2 AS c2, cx.c1 AS c1,
        |  cx.n1f AS n1f,
        |  CAST(coalesce(cc.n1p, 0) + 1 AS DOUBLE) /
        |    CAST(st.t + st.v AS DOUBLE) AS pcont
        | FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN cx USING (w1)
        |   LEFT JOIN cc USING (w2), st),
        |q AS (SELECT doc_id, pos,
        |  CASE WHEN c1 IS NULL THEN pcont
        |   ELSE greatest(CAST(coalesce(c2, 0) AS DOUBLE) - 0.75,
        |      CAST(0.0 AS DOUBLE)) / CAST(c1 AS DOUBLE)
        |    + ((0.75 * CAST(n1f AS DOUBLE)) / CAST(c1 AS DOUBLE)) * pcont
        |   END AS p,
        |  CASE WHEN c1 IS NULL THEN 1 ELSE 0 END AS backoff
        | FROM pr)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        | CAST(sum(backoff) AS BIGINT) AS n_backoff,
        | list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
        |   (a, b) -> a + b) AS sum_kn
        |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the text_fingerprint fold per 3-gram (ws[i:i+2] is DuckDB's
    // inclusive 1-based slice), then the same CURRENT ROW..3 FOLLOWING
    // window min per doc; tail windows are partial on both engines
    "winnow_fp" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, u.b.pos AS pos, u.b.g AS g FROM w,
        |  unnest(list_transform(range(1, len(ws) - 1),
        |    i -> struct_pack(pos := i - 1, g := ws[i:i+2]))) AS u(b)),
        |h AS (SELECT doc_id, pos, list_reduce(list_prepend(0,
        |   list_transform(g, x -> length(x) * 256 + ascii(x))),
        |  (h, v) -> (h * 31 + v) % 1000000007) AS h FROM g),
        |m AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM h),
        |f AS (SELECT DISTINCT doc_id, fp FROM m),
        |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
        |  CAST(sum(fp) AS BIGINT) AS fp_sum FROM f GROUP BY 1),
        |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        |  FROM g GROUP BY 1)
        |SELECT doc_id, n_grams, n_fp, fp_sum FROM c JOIN s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // same selection, then the capped shared-fingerprint self-join
    "winnow_pairs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, u.b.pos AS pos, u.b.g AS g FROM w,
        |  unnest(list_transform(range(1, len(ws) - 1),
        |    i -> struct_pack(pos := i - 1, g := ws[i:i+2]))) AS u(b)),
        |h AS (SELECT doc_id, pos, list_reduce(list_prepend(0,
        |   list_transform(g, x -> length(x) * 256 + ascii(x))),
        |  (h, v) -> (h * 31 + v) % 1000000007) AS h FROM g),
        |m AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM h),
        |f AS (SELECT DISTINCT doc_id, fp FROM m),
        |cold AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 1000),
        |f2 AS (SELECT f.doc_id, f.fp FROM f JOIN cold USING (fp))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | CAST(count(*) AS BIGINT) AS n_shared
        |FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin,
    // the lm_score probability pipeline, then per-language rank tertiles
    // in the same integer arithmetic ((rn-1)*3 // n + 1)
    "lm_buckets" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |bg AS (SELECT doc_id, u.b.pos AS pos, u.b.w1 AS w1, u.b.w2 AS w2
        | FROM d, unnest(list_transform(range(1, len(ws)),
        |   i -> struct_pack(pos := i - 1, w1 := ws[i], w2 := ws[i+1])))
        |   AS u(b)),
        |tbg AS (SELECT w1, w2 FROM bg WHERE doc_id % 10 <> 0),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM tbg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM tbg GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v FROM
        |  (SELECT unnest(ws) AS w FROM d WHERE doc_id % 10 <> 0)),
        |p AS (SELECT doc_id, pos,
        |  CAST(coalesce(c2, 0) + 1 AS DOUBLE) /
        |    CAST(coalesce(c1, 0) + v.v AS DOUBLE) AS p
        | FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1), v),
        |sc AS (SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
        |    (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS avg_condp
        | FROM p GROUP BY doc_id),
        |j AS (SELECT sc.doc_id, doc.lang, sc.avg_condp
        | FROM sc JOIN documents doc USING (doc_id)),
        |r AS (SELECT doc_id, lang, avg_condp,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY avg_condp DESC, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM j)
        |SELECT doc_id, lang, avg_condp,
        | CAST((rn - 1) * 3 // n + 1 AS BIGINT) AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    // both ranked lists reconstructed with the same expressions as their
    // standalone oracles (bm25 / sim_search), ranks assigned under the
    // identical total order, fused with double-precision 1/(60+rank)
    "search_rrf" ->
      """WITH b AS (
        | SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
        |  CAST(len(list_filter(ws, w -> w = 'join')) AS DOUBLE) AS tf_join,
        |  CAST(len(list_filter(ws, w -> w = 'hash')) AS DOUBLE) AS tf_hash,
        |  CAST(len(list_filter(ws, w -> w = 'scan')) AS DOUBLE) AS tf_scan
        | FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        |st AS (
        | SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl,
        |  sum(CASE WHEN tf_join > 0.0 THEN 1.0 ELSE 0.0 END) AS df_join,
        |  sum(CASE WHEN tf_hash > 0.0 THEN 1.0 ELSE 0.0 END) AS df_hash,
        |  sum(CASE WHEN tf_scan > 0.0 THEN 1.0 ELSE 0.0 END) AS df_scan
        | FROM b),
        |sc AS (
        | SELECT doc_id,
        |  (((n - df_join + 0.5) / (df_join + 0.5)) * (tf_join * 2.2) /
        |    (tf_join + 1.2 * (0.25 + 0.75 * (dl / (sumdl / n))))) +
        |  (((n - df_hash + 0.5) / (df_hash + 0.5)) * (tf_hash * 2.2) /
        |    (tf_hash + 1.2 * (0.25 + 0.75 * (dl / (sumdl / n))))) +
        |  (((n - df_scan + 0.5) / (df_scan + 0.5)) * (tf_scan * 2.2) /
        |    (tf_scan + 1.2 * (0.25 + 0.75 * (dl / (sumdl / n))))) AS score
        | FROM b, st),
        |lexr AS (
        | SELECT doc_id AS id,
        |  row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
        | FROM sc ORDER BY score DESC, doc_id LIMIT 100),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |dcos AS (
        | SELECT vec_id,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))),
        |    (a, b) -> a + b) /
        |  (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |     list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |     (a, b) -> a + b)) *
        |   sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |     list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |     (a, b) -> a + b))) AS cosine
        | FROM embeddings, q),
        |vecr AS (
        | SELECT vec_id AS id,
        |  row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank_vec
        | FROM dcos ORDER BY cosine DESC, vec_id LIMIT 100),
        |f AS (
        | SELECT coalesce(l.id, v.id) AS id,
        |  coalesce(CAST(1.0 AS DOUBLE) / (60 + l.rank_lex), 0.0)
        |   + coalesce(CAST(1.0 AS DOUBLE) / (60 + v.rank_vec), 0.0) AS rrf
        | FROM lexr l FULL OUTER JOIN vecr v ON l.id = v.id)
        |SELECT id, rrf FROM f ORDER BY rrf DESC, id LIMIT 20""".stripMargin,
    "pipeline_e2e" ->
      """WITH ws0 AS (
        | SELECT doc_id, lang, text, string_split(text, ' ') AS ws
        | FROM documents),
        |q AS (
        | SELECT doc_id, lang, text FROM ws0
        | WHERE NOT (CAST(len(ws) AS BIGINT) < 25
        |  OR CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in')))
        |      AS DOUBLE) / CAST(len(ws) AS DOUBLE) < 0.02
        |  OR CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) /
        |      CAST(len(ws) AS DOUBLE) > 0.65)),
        |sc AS (
        | SELECT doc_id, lang,
        |  replace(replace(replace(replace(text,
        |    'merge batch', '■'), 'spark', '■'), 'table', '■'),
        |    'value', '■') AS text
        | FROM q),
        |k AS (SELECT min(doc_id) AS doc_id FROM sc GROUP BY sha256(text)),
        |sv AS (SELECT sc.* FROM sc JOIN k USING (doc_id))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        | min(doc_id) AS first_doc
        |FROM sv GROUP BY 1 ORDER BY 1""".stripMargin,
    "dict_scrub" ->
      """WITH s AS (
        | SELECT doc_id,
        |  replace(replace(replace(replace(text,
        |    'merge batch', '■'), 'spark', '■'), 'table', '■'),
        |    'value', '■') AS scrubbed
        | FROM documents)
        |SELECT doc_id, CAST(length(scrubbed) AS BIGINT) AS n_chars,
        | sha256(scrubbed) AS scrub_hash
        |FROM s ORDER BY doc_id""".stripMargin,
    // per-term non-overlapping replace-count, summed — equal to the AC
    // all-end-positions count because no term self-overlaps; matched =
    // lexicographically ordered contained terms (matching the TreeSet)
    "dict_filter" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CAST((length(text) - length(replace(text, 'spark', '')))
        |    // length('spark')
        |   + (length(text) - length(replace(text, 'table', '')))
        |    // length('table')
        |   + (length(text) - length(replace(text, 'merge batch', '')))
        |    // length('merge batch')
        |   + (length(text) - length(replace(text, 'value', '')))
        |    // length('value') AS BIGINT) AS n_matches,
        |  concat_ws(',',
        |   CASE WHEN contains(text, 'merge batch') THEN 'merge batch' END,
        |   CASE WHEN contains(text, 'spark') THEN 'spark' END,
        |   CASE WHEN contains(text, 'table') THEN 'table' END,
        |   CASE WHEN contains(text, 'value') THEN 'value' END) AS matched
        | FROM documents)
        |SELECT doc_id, n_matches, matched FROM m
        |WHERE n_matches > 0 ORDER BY doc_id""".stripMargin,
    // same vocab-table shape: words → (word, freq), chars + '</w>' marker,
    // adjacent pairs weighted by freq (DuckDB's string_split('') has no
    // trailing empty; the Spark side filters Java's to match)
    "bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |wf AS (SELECT word, count(*) AS freq FROM w WHERE word <> ''
        |  GROUP BY 1),
        |sy AS (SELECT freq,
        |  list_append(string_split(word, ''), '</w>') AS syms FROM wf),
        |pr AS (SELECT freq, u.p.p1 AS p1, u.p.p2 AS p2 FROM sy,
        |  unnest(list_transform(range(1, len(syms)),
        |    i -> struct_pack(p1 := syms[i], p2 := syms[i+1]))) AS u(p))
        |SELECT p1, p2, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM pr GROUP BY 1, 2 ORDER BY cnt DESC, p1, p2 LIMIT 50""".stripMargin,
    // same injected suffix built from chr() so no literal encoding can
    // drift: tab + 'cafe' + U+0301 combining acute + doubled spaces +
    // trailing space; same cleanup order (NFC → control strip → collapse
    // → trim). DuckDB's nfc_normalize ≡ the custom NfcNormalize expression
    "text_normalize" ->
      """WITH r AS (SELECT doc_id,
        |  concat(text, chr(9), 'cafe', chr(769), '  bar ') AS raw
        | FROM documents),
        |n AS (SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
        |  trim(regexp_replace(regexp_replace(nfc_normalize(raw),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        | FROM r)
        |SELECT doc_id, n_raw, CAST(length(norm) AS BIGINT) AS n_norm,
        | sha256(norm) AS norm_hash
        |FROM n ORDER BY doc_id""".stripMargin,
    "dedup_normalized" ->
      """SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
        |   '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g'))) AS norm_hash,
        | CAST(count(*) AS BIGINT) AS n_dups, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // same synthesized fetch-variant URL, canonicalized by the same
    // anchored regexp chain (all patterns match at most once, so DuckDB's
    // first-match default equals Spark's replace-all): scheme stripped
    // case-insensitively, HOST lowercased + de-www'd, path case KEPT,
    // query/fragment and one trailing slash cut; null URLs filtered
    "dedup_url" ->
      """WITH u AS (
        | SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN NULL ELSE concat(
        |  CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END,
        |  CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
        |  CASE WHEN doc_id % 11 = 0 THEN 'EXAMPLE.COM' ELSE 'example.com' END,
        |  CASE WHEN doc_id % 13 = 0 THEN '/Page/' ELSE '/page/' END,
        |  CAST(doc_id % 100 AS VARCHAR),
        |  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
        |  CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed#r' ELSE '' END)
        |  END AS url
        | FROM documents),
        |ns AS (
        | SELECT doc_id, regexp_replace(url, '^https?://', '', 'i') AS u
        | FROM u WHERE url IS NOT NULL AND url <> '')
        |SELECT concat(
        |  regexp_replace(lower(regexp_extract(u, '^[^/?#]*')), '^www\.', ''),
        |  regexp_replace(regexp_replace(
        |    regexp_extract(u, '^[^/?#]*(.*)$', 1), '[?#].*$', ''), '/$', '')
        | ) AS canonical_url,
        | CAST(count(*) AS BIGINT) AS n_dups, min(doc_id) AS keeper
        |FROM ns GROUP BY 1 ORDER BY 1""".stripMargin,
    "inverted_index" ->
      """WITH p AS (
        | SELECT doc_id, u.s.i AS pos, u.s.w AS w
        | FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |  unnest(list_transform(range(1, len(ws) + 1),
        |    i -> struct_pack(i := i - 1, w := ws[i]))) AS u(s))
        |SELECT w AS token, doc_id, CAST(count(*) AS BIGINT) AS n_occ,
        | array_to_string(list(CAST(pos AS VARCHAR) ORDER BY pos), ',')
        |   AS positions
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the same expression shapes as the Spark side: idf ratio, one division
    // for avgdl, per-term scores summed left-to-right (join + hash + scan)
    "bm25" ->
      """WITH b AS (
        | SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl,
        |  CAST(len(list_filter(ws, w -> w = 'join')) AS DOUBLE) AS tf_join,
        |  CAST(len(list_filter(ws, w -> w = 'hash')) AS DOUBLE) AS tf_hash,
        |  CAST(len(list_filter(ws, w -> w = 'scan')) AS DOUBLE) AS tf_scan
        | FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        |st AS (
        | SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl,
        |  sum(CASE WHEN tf_join > 0.0 THEN 1.0 ELSE 0.0 END) AS df_join,
        |  sum(CASE WHEN tf_hash > 0.0 THEN 1.0 ELSE 0.0 END) AS df_hash,
        |  sum(CASE WHEN tf_scan > 0.0 THEN 1.0 ELSE 0.0 END) AS df_scan
        | FROM b)
        |SELECT doc_id,
        | CAST(tf_join AS BIGINT) AS tf_join,
        | CAST(tf_hash AS BIGINT) AS tf_hash,
        | CAST(tf_scan AS BIGINT) AS tf_scan,
        | (((n - df_join + 0.5) / (df_join + 0.5)) * (tf_join * 2.2) /
        |   (tf_join + 1.2 * (0.25 + 0.75 * (dl / (sumdl / n))))) +
        | (((n - df_hash + 0.5) / (df_hash + 0.5)) * (tf_hash * 2.2) /
        |   (tf_hash + 1.2 * (0.25 + 0.75 * (dl / (sumdl / n))))) +
        | (((n - df_scan + 0.5) / (df_scan + 0.5)) * (tf_scan * 2.2) /
        |   (tf_scan + 1.2 * (0.25 + 0.75 * (dl / (sumdl / n))))) AS score
        |FROM b, st ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "embed_quantize" ->
      """WITH pe AS (
        | SELECT vec_id, u.s.pos AS pos, u.s.x AS x
        | FROM embeddings,
        |  unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> struct_pack(pos := i - 1,
        |      x := CAST(embedding[i] AS DOUBLE)))) AS u(s)),
        |rng AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM pe GROUP BY 1),
        |q AS (
        | SELECT vec_id, x, lo, (hi - lo) / 255.0 AS scale,
        |  least(CASE WHEN (hi - lo) / 255.0 > 0.0
        |    THEN floor((x - lo) / ((hi - lo) / 255.0))
        |    ELSE 0.0 END, 255.0) AS code
        | FROM pe JOIN rng USING (pos))
        |SELECT vec_id,
        | max(abs(x - (lo + code * scale))) AS max_abs_err,
        | CAST(sum(CASE WHEN code = 255.0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_sat
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,
    // the dedup_cluster recursive-CTE oracle, restricted to cluster
    // representatives (node = min label) and joined back to the corpus
    "dedup_purge" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws) - 1),
        |        i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS s FROM w),
        |sh AS (SELECT doc_id, s FROM sh0
        |       QUALIFY count(*) OVER (PARTITION BY s) <= 1000),
        |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |cand AS (SELECT id_a, id_b FROM p
        |  JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) >= 0.5),
        |e AS (SELECT id_a AS src, id_b AS dst FROM cand
        |      UNION ALL SELECT id_b, id_a FROM cand),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN e ON e.src = r.node),
        |lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY 1),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
        |       FROM lab GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.source, sz.n_members
        |FROM lab JOIN sz USING (cluster_id)
        |JOIN documents d ON d.doc_id = lab.node
        |WHERE lab.node = lab.cluster_id
        |ORDER BY d.doc_id""".stripMargin,
    // plain GROUP BY + HAVING over all 3-grams — the sketch path must be
    // indistinguishable from this because denom ≤ k makes the MG candidate
    // set a superset of every qualifying gram; cnt is an exact integer and
    // share is one IEEE division of exact integers
    "heavy_hitters" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT unnest(list_transform(range(1, len(ws) - 1),
        |       i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS gram FROM w),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g)
        |SELECT gram, CAST(count(*) AS BIGINT) AS cnt,
        | CAST(count(*) AS DOUBLE) / CAST(n.n AS DOUBLE) AS share
        |FROM g, n GROUP BY gram, n.n
        |HAVING count(*) * 20000 >= n.n
        |ORDER BY cnt DESC, gram""".stripMargin,
    // integer rank-tertile + salted-hash order — every column is integer
    // arithmetic over window ranks, the lm_buckets/shuffle_global devices
    "curriculum_order" ->
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'curr1'), 1, 15))::BIGINT AS u
        | FROM documents),
        |r AS (SELECT doc_id, lang, n_tokens, u,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY n_tokens, doc_id) AS BIGINT) AS rn,
        |  CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        | FROM t),
        |p AS (SELECT doc_id, lang, n_tokens, u,
        |  ((rn - 1) * 3) // n + 1 AS phase FROM r)
        |SELECT doc_id, lang, n_tokens, CAST(phase AS BIGINT) AS phase,
        | CAST(row_number() OVER (PARTITION BY lang, phase
        |   ORDER BY u, doc_id) AS BIGINT) AS ord
        |FROM p ORDER BY doc_id""".stripMargin
  )
}

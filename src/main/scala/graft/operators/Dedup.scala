package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFns
import graft.plans.CosineSim
import graft.sources.Tables

/** Deduplication suite for training-data pipelines (SURVEY §2 E1–E5).
  *
  * Scale design: every candidate-generation step is a groupBy/join on a
  * BLOCKING key (hash, LSH band, simhash chunk, prefix) — shuffle volume
  * is O(docs × keys), never O(docs²); exact verification runs only
  * inside blocks. Oversized buckets (degenerate content) are capped —
  * the skew guard that keeps a 100 TB run from producing a quadratic
  * straggler.
  */
object Dedup {

  /** Explicit temp-store materialization for CORPUS-SIZED intermediates
    * that feed several plan subtrees (replaces `localCheckpoint`, which
    * pins partitions to executor-local storage with NO recompute path —
    * at 100 TB that is a full materialization of the exploded corpus on
    * executor disks, and one lost executor fails the job). A parquet
    * park is durable, re-readable by every consumer as ONE scan, and a
    * lost reader simply re-reads. The park lands under
    * [[graft.sources.Scratch]] (shared filesystem on a cluster; tmpdir
    * in local mode — r13 wrote to `java.io.tmpdir` unconditionally,
    * which on a multi-node cluster means executor tasks write parquet
    * to their own disks and the read-back sees partial data).
    *
    * One live dir per tag per JVM: each new park deletes the previous
    * generation, so repeated invocations (bench reps) hold bounded
    * disk. LIFETIME CONTRACT: a frame returned by an earlier park of
    * the same tag must be fully consumed before the tag is parked
    * again — the delete frees its backing files. Every caller here
    * satisfies it (each query invocation parks and drains its frames
    * within that invocation); inputs that are pure functions of a data
    * dir should use the fingerprint-memoized [[ensurePark]] instead,
    * which never deletes a live generation.
    */
  private val parkedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def parkTemp(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val dir = graft.sources.Scratch.path(spark,
      s"graft-park-$tag-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(dir)
    val prev = parkedDirs.put(tag, dir)
    if (prev != null) scala.util.Try {
      val p = new org.apache.hadoop.fs.Path(prev)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.read.parquet(dir)
  }

  /** Fingerprint-memoized park — the `ensureIvfIndex` contract for
    * parked intermediates that are PURE FUNCTIONS of a data dir: the
    * first invocation per (family, data content) pays the build, every
    * later one (bench reps, repeated dashboards) is a plain parquet
    * read. `family` carries the recipe version + a data-dir digest;
    * `gen` the data fingerprint (path#len#mtime — see
    * `Similarity.dataFingerprintFor`), so regenerated data can never
    * be served stale contents AND the superseded generation is swept
    * (Scratch.ensure) instead of leaking corpus-sized parquet per
    * regeneration.
    */
  private def ensurePark(spark: SparkSession, family: String, gen: String)
                        (build: => DataFrame): DataFrame =
    spark.read.parquet(
      graft.sources.Scratch.ensure(spark, family, gen)(p =>
        build.write.mode("overwrite").parquet(p)))

  /** E1 — exact dedup via content hash. One map-side-combined groupBy;
    * keep_id is the minimal doc_id of each identical-text group.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("keep_id"))

  val exactSql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents
      |GROUP BY 1
      |ORDER BY keep_id""".stripMargin

  /** E27 — dedup audit report (the per-source duplication-rate table
    * every pipeline run publishes before committing a corpus — which
    * sources are worth crawling, which are mirror farms). Two exchanges
    * total: the E1 hash aggregate, then its counts joined back to the
    * docs on the same hash key (exchange reuse) and rolled up by
    * source. dup_rate divides two exact integers.
    */
  def dedupStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val groups = docs.groupBy(col("h"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("keeper"))
    docs.join(groups.hint("shuffle_hash"), "h")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_in_dup_groups"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)).as("n_removed"))
      .withColumn("dup_rate", col("n_removed").cast("double") / col("n_docs"))
      .orderBy(col("source"))
  }

  val dedupStatsSql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, md5(text) AS h FROM documents),
      |groups AS (
      |  SELECT h, count(*) AS c, min(doc_id) AS keeper FROM docs GROUP BY h)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_groups,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_rate
      |FROM docs JOIN groups USING (h)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Max docs an LSH/simhash bucket may hold before it is dropped as
    * degenerate (near-constant content). Keeps pair generation from
    * going quadratic on skewed buckets.
    */
  val maxBucketSize = 200

  /** All unordered member pairs within capped buckets — ONE pass over
    * the (key, member) table instead of the bucket-census aggregate
    * plus a two-sided self-join (r14 optimization): the old shape
    * re-evaluated the upstream sketch subtree once per join side plus
    * once per census side — four corpus scans/sketchings at 100 TB
    * where one suffices — and paid three key exchanges where this pays
    * one. Shape: one exchange on `key`; a window count drops over-cap
    * buckets BEFORE any list materializes (WindowExec pages partitions
    * to disk, so a degenerate hot bucket is a bounded straggler, never
    * an OOM — the same skew armor the census+join form had); the
    * surviving bucket (≤ [[maxBucketSize]] rows) collects, sorts, and
    * explodes its i<j pairs via array expressions.
    *
    * Pair semantics are byte-identical to the self-join form: members
    * survive with multiplicity, so a bucket holding {a×2, b×3} emits
    * (a,b) six times exactly as the join did — callers keep their exact
    * downstream semantics (winnowing's ≥2-shared count, minhash's
    * distinct()). Same-member pairs are excluded by the caller's
    * strict `<` on the sorted emission, as the join's `doc_a < doc_b`
    * did. `member` may be a struct carrying a SMALL fixed payload
    * (e.g. simhash's 8-byte signature — saves the verify join-backs);
    * heavy payloads (shingle sets, text) must stay on the join-back
    * path per the §8 shuffle-keys-not-payloads rule.
    */
  private[operators] def bucketPairs(cand: DataFrame, key: Column,
                                     member: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ms = col("ms")
    cand.select(key.as("bp_key"), member.as("bp_m"))
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("bp_key"))))
      .filter(col("bn").between(2, maxBucketSize))
      .groupBy(col("bp_key"))
      .agg(sort_array(collect_list(col("bp_m"))).as("ms"))
      .select(explode(flatten(transform(ms, (a, i) =>
        transform(slice(ms, i + lit(2), size(ms)),
          b => struct(a.alias("a"), b.alias("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
  }

  /** E2 — MinHash + LSH near-dup pairs.
    * shingle(3-word) → 64-wide minhash → 16 bands × 4 rows → band-bucket
    * self-join → exact Jaccard verify (≥ threshold) inside buckets only.
    * Band probability: P(candidate) = 1-(1-j⁴)¹⁶ — ~0.97 at j=0.8.
    */
  def minhashPairs(spark: SparkSession, dir: String, threshold: Double = 0.7): DataFrame =
    minhashPairsDf(Tables.documents(spark, dir), threshold)

  /** DataFrame-level core of E2 — any (doc_id, text) input. */
  def minhashPairsDf(documents: DataFrame, threshold: Double): DataFrame = {
    // sketch kernels are per-row CPU work — run at compute parallelism,
    // not scan-split parallelism (a single parquet file = one task)
    val docs = Tables.atComputeParallelism(documents)
      .select(col("doc_id"), HashFns.shingleHashSet(col("text"), 3).as("sh"))
      .withColumn("sig", HashFns.minhashSignature(col("sh"), 64))

    // one-pass capped-bucket pair mining (bucketPairs): the signature
    // subtree evaluates ONCE instead of once per self-join/census side
    val cand = docs.select(col("doc_id"), explode(HashFns.bandKeys(col("sig"), 16, 4)).as("band"))
    val pairs = bucketPairs(cand, col("band"), col("doc_id"))
      .filter(col("a") < col("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
      .distinct()

    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(HashFns.jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB macro prelude shared by the E2/E3 oracle replicas: exact
    * 64-bit WRAPPING arithmetic built on HUGEINT (128-bit) — `mul64`
    * splits operands into 32-bit halves so no intermediate exceeds
    * 2¹²⁸, `fmix64` is the splitmix finalizer (plans/Sketches.fmix64)
    * bit-for-bit, `tok_hash` is the FNV-1a-over-bytes token hash
    * (valid because the corpus is ASCII: code point == UTF-8 byte).
    * Signed/unsigned bridges replicate the JVM's SIGNED long min/sort
    * where the kernels compare. Statement-per-stage (temp tables, not
    * one fused query) because DuckDB evaluates big macro expressions
    * ~10× slower inside join/aggregate operators than over a
    * materialized flat table.
    */
  private val sketchOracleMacros: String =
    """CREATE OR REPLACE MACRO mul64(a, b) AS
      |  ((a % 4294967296) * (b % 4294967296)
      |   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296)
      |     * 4294967296) % 18446744073709551616;
      |CREATE OR REPLACE MACRO x33(v) AS xor(v, v // 8589934592);
      |CREATE OR REPLACE MACRO fmix64(v) AS
      |  x33(mul64(x33(mul64(x33(v), 18397679294719823053::HUGEINT)), 14181476777654086739::HUGEINT));
      |CREATE OR REPLACE MACRO tok_hash(t) AS fmix64(
      |  list_reduce(
      |    list_prepend(14695981039346656037::HUGEINT,
      |      list_transform(range(1, length(t) + 1),
      |        i -> CAST(ord(substr(t, CAST(i AS INT), 1)) AS HUGEINT))),
      |    (h, c) -> mul64(xor(h, c), 1099511628211::HUGEINT)));
      |CREATE OR REPLACE MACRO to_signed(u) AS CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
      |  THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT);
      |CREATE OR REPLACE MACRO to_u64(s) AS CASE WHEN s < 0
      |  THEN CAST(s AS HUGEINT) + 18446744073709551616::HUGEINT ELSE CAST(s AS HUGEINT) END;
      |""".stripMargin

  /** Full independent replica of the E2 pipeline — NgramHashes(n=3,
    * distinct) → MinHashSig(k=64) → BandKeys(16×4) → capped band
    * buckets → exact-Jaccard verify — so the CANDIDATE GENERATION
    * (signatures, banding, bucketing), not just the verified pairs, is
    * oracle-checked. Constants (3-shingles, 64 seeds, 16 bands × 4
    * rows, cap 200, threshold 0.7) mirror minhashPairs' defaults.
    */
  val minhashPairsSql: String = sketchOracleMacros +
    """CREATE OR REPLACE TEMP TABLE g_mh_th AS
      |SELECT doc_id, pos, tok_hash(tok) AS th
      |FROM (SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
      |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents));
      |CREATE OR REPLACE TEMP TABLE g_mh_thl AS
      |SELECT doc_id, list(th ORDER BY pos) AS thl, count(*) AS len
      |FROM g_mh_th GROUP BY doc_id;
      |CREATE OR REPLACE TEMP TABLE g_mh_shset AS
      |SELECT DISTINCT doc_id, fmix64(a3) AS sh FROM (
      |  SELECT doc_id,
      |    CASE WHEN w + 2 <= len THEN xor(mul64(a2, 1099511628211::HUGEINT), thl[CAST(w + 2 AS INT)])
      |         ELSE a2 END AS a3
      |  FROM (
      |    SELECT doc_id, thl, len, w,
      |      CASE WHEN w + 1 <= len THEN xor(mul64(a1, 1099511628211::HUGEINT), thl[CAST(w + 1 AS INT)])
      |           ELSE a1 END AS a2
      |    FROM (
      |      SELECT doc_id, thl, len, w,
      |        xor(mul64(11400714819323198485::HUGEINT, 1099511628211::HUGEINT),
      |            thl[CAST(w AS INT)]) AS a1
      |      FROM g_mh_thl, unnest(range(1, greatest(len - 2, 1) + 1)) AS u(w))));
      |CREATE OR REPLACE TEMP TABLE g_mh_xor AS
      |SELECT t.doc_id, sd.s, xor(t.sh, sd.seed) AS x
      |FROM g_mh_shset t CROSS JOIN (
      |  SELECT s, fmix64(mul64(11400714819323198485::HUGEINT, CAST(s AS HUGEINT))) AS seed
      |  FROM unnest(range(1, 65)) AS u(s)) sd;
      |CREATE OR REPLACE TEMP TABLE g_mh_fm AS
      |SELECT doc_id, s, fmix64(x) AS v FROM g_mh_xor;
      |CREATE OR REPLACE TEMP TABLE g_mh_sig AS
      |SELECT doc_id, list(to_u64(minv) ORDER BY s) AS sig
      |FROM (SELECT doc_id, s, min(to_signed(v)) AS minv FROM g_mh_fm GROUP BY doc_id, s)
      |GROUP BY doc_id;
      |CREATE OR REPLACE TEMP TABLE g_mh_bandacc AS
      |SELECT doc_id, a4 FROM (
      |  SELECT doc_id, xor(mul64(a3, 1099511628211::HUGEINT), sig[CAST((b-1)*4 + 4 AS INT)]) AS a4 FROM (
      |    SELECT doc_id, b, sig, xor(mul64(a2, 1099511628211::HUGEINT), sig[CAST((b-1)*4 + 3 AS INT)]) AS a3 FROM (
      |      SELECT doc_id, b, sig, xor(mul64(a1, 1099511628211::HUGEINT), sig[CAST((b-1)*4 + 2 AS INT)]) AS a2 FROM (
      |        SELECT doc_id, b, sig,
      |          xor(mul64(fmix64(mul64(11400714819323198485::HUGEINT, CAST(b AS HUGEINT))),
      |                    1099511628211::HUGEINT), sig[CAST((b-1)*4 + 1 AS INT)]) AS a1
      |        FROM g_mh_sig, unnest(range(1, 17)) AS u(b)))));
      |CREATE OR REPLACE TEMP TABLE g_mh_bands AS
      |SELECT doc_id, to_signed(fmix64(a4)) AS band FROM g_mh_bandacc;
      |CREATE OR REPLACE TEMP TABLE g_mh_shl AS
      |SELECT doc_id, list(sh) AS shl FROM g_mh_shset GROUP BY doc_id;
      |WITH ok AS (
      |  SELECT band FROM g_mh_bands GROUP BY band HAVING count(*) BETWEEN 2 AND 200),
      |inb AS (SELECT c.* FROM g_mh_bands c JOIN ok USING (band)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM inb a JOIN inb b USING (band)
      |  WHERE a.doc_id < b.doc_id),
      |scored AS (
      |  SELECT doc_a, doc_b,
      |    round(CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE) /
      |          (len(x.shl) + len(y.shl) - len(list_intersect(x.shl, y.shl))), 4) AS jaccard
      |  FROM cand JOIN g_mh_shl x ON x.doc_id = doc_a
      |            JOIN g_mh_shl y ON y.doc_id = doc_b)
      |SELECT doc_a, doc_b, jaccard FROM scored
      |WHERE jaccard >= 0.7
      |ORDER BY doc_a, doc_b""".stripMargin

  /** E3 — SimHash near-dup pairs: 64-bit signature, 4×16-bit chunk
    * blocking (pigeonhole: hamming ≤ 3 ⇒ ≥1 chunk equal), verify
    * hamming ≤ 3 on candidates.
    */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    simhashPairsDf(Tables.documents(spark, dir), maxHamming)

  /** DataFrame-level core of E3 — any (doc_id, text) input. */
  def simhashPairsDf(documents: DataFrame, maxHamming: Int): DataFrame = {
    val docs = Tables.atComputeParallelism(documents)
      .select(col("doc_id"),
        HashFns.simhash64(HashFns.tokenHashes(col("text"))).as("sig"))

    // one-pass capped-bucket pair mining; the 8-byte signature rides in
    // the bucket member (fixed small payload), so there is NO verify
    // join-back at all — the old shape recomputed the signature scan
    // three times and shuffled it through two extra exchanges
    val chunked = docs.select(col("doc_id"), col("sig"),
      explode(HashFns.simhashChunks(col("sig"), 4)).as("chunk"))
    bucketPairs(chunked, col("chunk"),
        struct(col("doc_id"), col("sig")))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        HashFns.hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Full independent replica of the E3 pipeline — token hashes →
    * SimHash64 bit-majority signature → 4×16-bit chunk blocking
    * (pigeonhole) → capped buckets → hamming ≤ 3 verify. Constants
    * mirror simhashPairs' defaults (4 chunks, cap 200, maxHamming 3).
    * The power-of-two table is built by recursive doubling because
    * `2 ** b` in DuckDB is a DOUBLE (loses bits past 2⁵³).
    */
  val simhashPairsSql: String = sketchOracleMacros +
    """CREATE OR REPLACE TEMP TABLE g_pow AS
      |WITH RECURSIVE p(b, pw) AS (
      |  SELECT 0, 1::HUGEINT UNION ALL SELECT b + 1, pw * 2 FROM p WHERE b < 63)
      |SELECT b, pw FROM p;
      |CREATE OR REPLACE TEMP TABLE g_sh_tok AS
      |SELECT doc_id, tok_hash(tok) AS h
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents);
      |CREATE OR REPLACE TEMP TABLE g_sh_th AS
      |SELECT doc_id,
      |  fmix64(xor(mul64(11400714819323198485::HUGEINT, 1099511628211::HUGEINT), h)) AS th
      |FROM g_sh_tok;
      |CREATE OR REPLACE TEMP TABLE g_sh_bit AS
      |SELECT t.doc_id, p.b, p.pw, (t.th // p.pw) % 2 = 1 AS bit
      |FROM g_sh_th t CROSS JOIN g_pow p;
      |CREATE OR REPLACE TEMP TABLE g_sh_sig AS
      |SELECT doc_id,
      |  to_signed(CAST(sum(CASE WHEN cnt > 0 THEN pw ELSE 0 END) AS HUGEINT)) AS sig
      |FROM (
      |  SELECT doc_id, b, pw, sum(CASE WHEN bit THEN 1 ELSE -1 END) AS cnt
      |  FROM g_sh_bit GROUP BY doc_id, b, pw) c
      |GROUP BY doc_id;
      |WITH chunked AS (
      |  SELECT doc_id, sig, c.b // 16 AS chunk_id,
      |    (to_u64(sig) // c.pw) % 65536 AS chunk_val
      |  FROM g_sh_sig CROSS JOIN (SELECT b, pw FROM g_pow WHERE b % 16 = 0) c(b, pw)),
      |ok AS (
      |  SELECT chunk_id, chunk_val FROM chunked
      |  GROUP BY chunk_id, chunk_val HAVING count(*) BETWEEN 2 AND 200),
      |inb AS (
      |  SELECT c.* FROM chunked c JOIN ok USING (chunk_id, chunk_val)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    bit_count(xor(a.sig, b.sig)) AS hamming
      |  FROM inb a JOIN inb b USING (chunk_id, chunk_val)
      |  WHERE a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming FROM cand
      |WHERE hamming <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** E4 — exact n-gram Jaccard inside prefix blocks. Blocking key: the
    * first two words (cheap, deterministic, SQL-reproducible — so this
    * one IS oracle-checked; MinHash (E2) is the general-recall path).
    *
    * Skew guard: like E2/E3, blocks are capped at [[maxBucketSize]]
    * docs — log corpora are exactly the domain where a hot two-word
    * prefix ("GET /index", boilerplate headers) otherwise makes one
    * block quadratic. The cap is a declared part of the operator's
    * semantics and is mirrored in the DuckDB oracle (here and in
    * canonicalCorpus's edge mining), so the query stays fully
    * oracle-checked with the cap ACTIVE. Singleton blocks are pruned
    * by the same count (they can't produce a pair).
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    // shingles carried as 64-bit hashes, not strings: set intersection
    // cardinality is identical (xxhash64 collisions are negligible) and
    // long-array intersection is far cheaper than string-array
    // mining runs on THIN (block, doc_id) rows — the shingle sets are
    // neither computed nor shuffled until the capped pair list exists
    // (the old census + self-join shape computed them three times and
    // carried them through the block exchange); the verify join-backs
    // attach each side's set by doc_id
    val keyed = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("block"))
    val pairs = bucketPairs(keyed, col("block"), col("doc_id"))
      .filter(col("a") < col("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    val docs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), HashFns.shingleHashSet(col("text"), 3).as("sh"))
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** E4b — edit-distance (Levenshtein) near-dup inside the same prefix
    * blocks as E4. Relative distance (÷ longer length) so long docs
    * aren't penalized; the threshold applies to the ROUNDED ratio
    * (cross-engine boundary stability). Levenshtein is O(len²) per
    * pair — blocking is what keeps it feasible; at 100 TB the MinHash
    * candidates (E2) feed this as the high-precision verifier.
    */
  /** Hierarchical prefix blocking depth cut-over: a 2-word block whose
    * membership exceeds this re-keys its docs by their 4-word prefix.
    * The §8h sf1 scaling study measured flat 2-word blocking at 27× on
    * 10× data — block depth grows with corpus size, so within-block
    * pair volume grows quadratically; the second level restores
    * near-linear candidate growth. Recall concession is explicit: a
    * pair differing inside words 3–4 separates at level 2 — but such
    * pairs already risked separating at level 1 if the edit fell in
    * words 1–2 (the known prefix-blocking trade). Level-2 blocks past
    * `maxBucketSize` drop entirely, same skew discipline as MinHash
    * banding. At the oracle-checked SFs every 2-word block is far
    * below this depth (max 14 at sf0.1), so the tested results are
    * IDENTICAL to flat blocking.
    */
  val levenshteinSubBlockDepth: Int = 32

  def levenshteinPairs(spark: SparkSession, dir: String, maxRel: Double = 0.25): DataFrame = {
    // the block ASSIGNMENT computes on thin (doc_id, b2, b4) rows —
    // document text must not ride the depth/cap aggregates' shuffles
    // (measured +1.5 s at sf0.1 when it did)
    val keys = Tables.documents(spark, dir).select(
      col("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("b2"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("b4"))
    val depth2 = keys.groupBy(col("b2")).agg(count(lit(1)).as("n2"))
    val keyed = keys.join(depth2, "b2")
      .withColumn("block",
        when(col("n2") <= levenshteinSubBlockDepth, concat(lit("2:"), col("b2")))
          .otherwise(concat(lit("4:"), col("b4"))))
    // one-pass capped-bucket pair mining over the THIN (block, doc_id)
    // assignment (the old shape joined text onto the assignment and
    // self-joined — the text-carrying subtree evaluated once per side);
    // text attaches by doc_id, and the second join leaves pairs spread
    // by the doc_b hash (bucket-capped per block), so the O(len²) DP
    // keeps full parallelism without an extra repartition
    val pairIds = bucketPairs(keyed, col("block"), col("doc_id"))
      .filter(col("a") < col("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val la = length(col("text_a")); val lb = length(col("text_b"))
    pairIds
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      // free pruning: edit distance >= |len_a - len_b|, so rel <= maxRel
      // forces the lengths within maxRel of each other — skip the O(n²)
      // DP for pairs that can't qualify (margin covers the 4dp rounding)
      .filter(least(la, lb) >= (lit(1.0 - maxRel - 0.001) * greatest(la, lb)) - 1)
      // compute-width repartition before the banded DP: the surviving
      // pair table is byte-small, so AQE's coalescing would otherwise
      // run the O(len×threshold) kernel on a handful of tasks (see
      // substringCutPass)
      .repartition(spark.sparkContext.defaultParallelism)
      // banded early-exit DP: per-row threshold caps the work at
      // O(len × threshold). Filter on the RAW distance (not a derived
      // rounded column) so predicate pushdown doesn't re-inline the
      // levenshtein expression into extra evaluations per row; the
      // +0.00005 margin makes the raw cut identical to the 4dp-rounded
      // cut the output column (and the oracle) applies. -1 = above
      // threshold.
      // the band cap is computed from the SAME expression as the accept
      // cut below (+1 slack): with a tighter cap like int(maxRel·len)+2,
      // documents past ~40k chars (0.00005·len > 2) could have the DP
      // return -1 for pairs the accept filter would keep.
      // EvalOnce: without it the two accept filters inline into the join
      // condition and the banded DP runs THREE times per candidate pair
      // (twice in the condition, once in the projection) — observed on
      // the r7 plan; DedupSpec asserts the single-occurrence property
      .withColumn("edit_dist", graft.plans.EvalOnce(expr(
        s"levenshtein(text_a, text_b, " +
          s"CAST(($maxRel + 0.00005) * greatest(length(text_a), length(text_b)) AS INT) + 1)")
        .cast("long")))
      .filter(col("edit_dist") >= 0 &&
        col("edit_dist").cast("double") <=
          lit(maxRel + 0.00005) * greatest(la, lb))
      .select(col("doc_a"), col("doc_b"), col("edit_dist"),
        round(col("edit_dist").cast("double") / greatest(la, lb), 4).as("rel_dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val levenshteinPairsSql: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    concat_ws(' ', string_split(text, ' ')[1], string_split(text, ' ')[2]) AS block
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
      |  round(CAST(levenshtein(a.text, b.text) AS DOUBLE) /
      |        greatest(length(a.text), length(b.text)), 4) AS rel_dist
      |FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
      |WHERE round(CAST(levenshtein(a.text, b.text) AS DOUBLE) /
      |            greatest(length(a.text), length(b.text)), 4) <= 0.25
      |ORDER BY doc_a, doc_b""".stripMargin

  val ngramJaccardSql: String =
    """WITH t0 AS (
      |  SELECT doc_id,
      |    concat_ws(' ', words[1], words[2]) AS block,
      |    list_distinct(list_transform(range(greatest(len(words) - 2, 1)),
      |      i -> words[i+1] || ' ' || words[i+2] || ' ' || words[i+3])) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      |ok AS (
      |  SELECT block FROM t0 GROUP BY block HAVING count(*) BETWEEN 2 AND 200),
      |t AS (
      |  SELECT t0.* FROM t0 JOIN ok USING (block))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |        len(list_distinct(a.sh || b.sh)), 4) AS jaccard
      |FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
      |WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |            len(list_distinct(a.sh || b.sh)), 4) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** E5 — embedding-cosine near-dup pairs via the native CosineSim
    * expression. At these SFs an all-pairs nested-loop join (small side
    * broadcast) is optimal; at 100 TB the E7 LSH bucketing becomes the
    * candidate generator and this stays the verify kernel.
    */
  def embeddingPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    CosineSim.register(spark)
    val e = Tables.embeddings(spark, dir)
    // stream side of the all-pairs kernel: O(n²) cosines must run at
    // compute parallelism, not the scan's file-split count
    val a = Tables.atComputeParallelism(e)
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", CosineSim(col("emb_a"), col("emb_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 6).as("cos_sim"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** E1+E4 composition — the canonical deduplicated corpus: union the
    * exact-dup and near-dup pair sets into an undirected graph and
    * resolve each connected component to its minimal doc_id via
    * min-label propagation (iterate: label := min(label, neighbors'
    * labels) until fixpoint).
    *
    * Scale notes: each iteration is one shuffle join on doc_id; the
    * iteration count is the component diameter (tiny for dup clusters —
    * converges in 2-4 rounds here); `localCheckpoint` cuts the lineage
    * so plans don't grow exponentially across iterations. This is the
    * step a real training-data pipeline runs after pair mining.
    */
  def canonicalCorpus(spark: SparkSession, dir: String,
                      smallGraphMaxEdges: Long = 1000000L): DataFrame = {
    val nearEdges = ngramJaccard(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    // exact-dup edges are mined separately: identical texts share their
    // prefix block, but E4's skew cap drops over-cap blocks, and exact
    // dups must still link there. The hash groupBy emits STAR edges
    // (group-min → member) — linear in group size, no pairwise join,
    // so no cap is needed even for a degenerate million-copy document.
    val hashed = Tables.documents(spark, dir)
      .select(md5(col("text")).as("h"), col("doc_id"))
    val exactEdges = hashed
      .join(hashed.groupBy(col("h")).agg(min(col("doc_id")).as("a")), "h")
      .filter(col("doc_id") =!= col("a"))
      .select(col("a"), col("doc_id").as("b"))
    val edges = nearEdges.unionByName(exactEdges)
    // symmetric edge list; iterate ONLY over docs that appear in the dup
    // graph — everything else is trivially its own keeper. At 100 TB the
    // dup graph is a small fraction of the corpus, so each propagation
    // round shuffles the graph, never the corpus.
    // lazy checkpoint: the count() below is the materializing action,
    // so edge mining + symmetrization + count run as ONE job instead of
    // a checkpoint job followed by a count job
    val symFull = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b"))).distinct()
      .localCheckpoint(eager = false)
    // right-size the iteration: the dup graph is usually a tiny fraction
    // of the corpus, and label propagation re-shuffles it every round —
    // run the loop at a partition count proportional to the (now known,
    // checkpoint is materialized) edge count, not the session default.
    // ~1M edges per partition; a 100 TB corpus with a billion dup edges
    // still gets a full-width shuffle.
    val edgeCount = symFull.count()

    // Small-graph fast path: below ~1M edges the component resolution
    // is query-plan-sized, not data-sized — union-find on the driver
    // beats paying per-round Spark job overhead (each distributed round
    // costs a join + agg + checkpoint + count). The mapping is
    // re-broadcast as a DataFrame, so the CORPUS never leaves the
    // cluster; only the dup-graph edges do, and only under the bound.
    // Above the bound (a 100 TB corpus can mine billions of edges) the
    // distributed label-propagation loop below runs instead.
    val labels: DataFrame = if (edgeCount <= smallGraphMaxEdges) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      symFull.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        val (ra, rb) = (find(a), find(b))
        // min-root union so the component label is its minimal doc_id,
        // identical to the propagation fixpoint
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = parent.keySet ++ parent.values
      import spark.implicits._
      nodes.toSeq.map(n => (n, find(n))).toDF("doc_id", "label")
    } else {
      distributedComponents(spark, symFull, edgeCount)
    }
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("keep_id"))
      .orderBy(col("doc_id"))
  }

  /** Build-once canonical mapping: the E5b (doc_id, keep_id) output
    * persisted per data fingerprint — the deployment shape: components
    * are resolved ONCE after pair mining, then every selection pass
    * (E38 sampling, E43 election) reads the mapping like an index
    * instead of re-mining the dup graph. Same memoization contract as
    * ensureIvfIndex: `_COMPLETE` written last, data fingerprint in the
    * key so in-place regenerated data rebuilds.
    */
  def ensureCanonical(spark: SparkSession, dir: String): String = {
    val fp = Similarity.dataFingerprintFor(spark, dir, "documents.parquet")
    graft.sources.Scratch.ensure(spark,
      s"graft-canon-v1-${graft.sources.Scratch.digest(dir)}",
      graft.sources.Scratch.digest(fp)) { path =>
      canonicalCorpus(spark, dir).write.mode("overwrite").parquet(s"$path/map")
    }
  }

  /** The memoized mapping as a frame (build on first call per dir). */
  def canonicalMapping(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${ensureCanonical(spark, dir)}/map")

  /** E43 — QUALITY-AWARE canonical member election (SlimPajama-style
    * "keep the longest copy": min-id election biases the kept corpus
    * toward whatever happened to be crawled first; electing by a
    * quality key keeps the BEST copy of each dup cluster). Rides E5b's
    * component resolution unchanged; the election is one
    * component-keyed aggregate — argmax by (n_chars, then min doc_id)
    * as a struct min, exact and tie-broken with no window — joined
    * back onto the membership (elected is one row per component,
    * ≪ corpus).
    */
  def canonicalCorpusQuality(spark: SparkSession, dir: String): DataFrame = {
    val withQ = canonicalMapping(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")), "doc_id")
    val elected = withQ.groupBy(col("keep_id"))
      .agg(min(struct((-col("n_chars")).as("neg"), col("doc_id").as("d"))).as("e"))
      .select(col("keep_id"), col("e.d").as("keep_doc"))
    withQ.join(elected, "keep_id")
      .select(col("doc_id"), col("keep_doc"))
      .orderBy(col("doc_id"))
  }

  lazy val canonicalCorpusQualitySql: String =
    SqlPatch(canonicalCorpusSql,
      "\nSELECT s AS doc_id, min(d) AS keep_id FROM reach GROUP BY s ORDER BY doc_id",
      """,
        |canon AS (SELECT s AS doc_id, min(d) AS keep_id FROM reach GROUP BY s),
        |withq AS (
        |  SELECT c.doc_id, c.keep_id, d.n_chars
        |  FROM canon c JOIN documents d USING (doc_id)),
        |elected AS (
        |  SELECT keep_id, doc_id AS keep_doc FROM (
        |    SELECT keep_id, doc_id,
        |      row_number() OVER (PARTITION BY keep_id ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM withq) WHERE rn = 1)
        |SELECT w.doc_id, e.keep_doc
        |FROM withq w JOIN elected e USING (keep_id)
        |ORDER BY doc_id""".stripMargin)

  /** Distributed min-label propagation over the symmetric edge list —
    * the big-graph path of canonicalCorpus. Each iteration is one
    * shuffle join; iteration count = component diameter.
    */
  private def distributedComponents(spark: SparkSession, symFull: DataFrame,
                                    edgeCount: Long): DataFrame = {
    // right-size the iteration: run the loop at a partition count
    // proportional to the edge count, not the session default —
    // ~1M edges per partition; a billion-edge graph still gets a
    // full-width shuffle.
    val nParts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (edgeCount / 1000000L).toInt + 1))
    val sym = symFull.repartition(nParts, col("b")).localCheckpoint()

    var labels = sym.select(col("a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      // one join + one aggregation per round: neighbor labels arrive via
      // the edge join, each node's own label rides along as a tagged
      // self-row in the same union, and a single groupBy produces BOTH
      // the new label (min over all) and the old one (the self-row) —
      // no second join, and the convergence check is a filter on the
      // checkpointed result
      val neighborLabels = sym
        .join(labels.select(col("doc_id").as("b"), col("label").as("nl")), "b")
        .select(col("a"), col("nl"), lit(false).as("self"))
      val selfLabels = labels
        .select(col("doc_id").as("a"), col("label").as("nl"), lit(true).as("self"))
      val updated = neighborLabels.unionByName(selfLabels)
        .groupBy(col("a"))
        .agg(min(col("nl")).as("label"),
          max(when(col("self"), col("nl"))).as("old"))
        .localCheckpoint()
      changed = updated.filter(col("label") =!= col("old")).count()
      labels = updated.select(col("a").as("doc_id"), col("label"))
      iter += 1
    }
    labels
  }

  /** DuckDB oracle: transitive closure over the same edge set (exact-dup
    * pairs ∪ prefix-blocked ngram-jaccard pairs), component root = min
    * reachable id. Components are small, so the closure stays small.
    */
  val canonicalCorpusSql: String =
    """WITH RECURSIVE words AS (SELECT doc_id, string_split(text, ' ') AS w, md5(text) AS h FROM documents),
      |t AS (
      |  SELECT doc_id, h,
      |    concat_ws(' ', w[1], w[2]) AS block,
      |    list_distinct(list_transform(range(greatest(len(w) - 2, 1)),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
      |  FROM words),
      |ok AS (
      |  SELECT block FROM t GROUP BY block HAVING count(*) BETWEEN 2 AND 200),
      |near AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM (SELECT t.* FROM t JOIN ok USING (block)) a
      |  JOIN (SELECT t.* FROM t JOIN ok USING (block)) b
      |  ON a.block = b.block AND a.doc_id < b.doc_id
      |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |              len(list_distinct(a.sh || b.sh)), 4) >= 0.5),
      |exact AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b FROM t a JOIN t b
      |  ON a.h = b.h AND a.doc_id < b.doc_id),
      |edges AS (
      |  SELECT a, b FROM near UNION SELECT a, b FROM exact
      |  UNION SELECT b, a FROM near UNION SELECT b, a FROM exact),
      |reach(s, d) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT r.s, e.b FROM reach r JOIN edges e ON r.d = e.a)
      |SELECT s AS doc_id, min(d) AS keep_id FROM reach GROUP BY s ORDER BY doc_id""".stripMargin

  val embeddingPairsSql: String =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  // ---- E20: passage-level exact dedup --------------------------------

  /** Words per passage window. Public anchor: Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better")
    * dedups repeated ~50-token spans ACROSS otherwise-distinct
    * documents — document-level near-dup (E2–E5b) misses a boilerplate
    * paragraph pasted into thousands of unique pages. The corpus here
    * is single-line (no '\n' paragraph breaks), so the passage unit is
    * a fixed non-overlapping window of consecutive words.
    */
  val passageWords = 10

  /** E20 — per-document duplicated-passage profile.
    *
    * Scale shape: passages are cut with pure array expressions inside
    * the scan (no shuffle), corpus-wide occurrence counts are one
    * map-side-combined groupBy on the passage hash, and the flag join
    * is hash-to-hash — both sides arrive partitioned by `h`, so the
    * exchange is reused. Nothing is ever joined doc×doc; shuffle
    * volume is O(total passages), invariant to how duplicated the
    * corpus is.
    */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame =
    paragraphDedupDf(Tables.documents(spark, dir))

  /** DataFrame-level core of E20 — any (doc_id, text) input. */
  def paragraphDedupDf(documents: DataFrame): DataFrame = {
    val P = passageWords
    val ws = split(col("text"), " ")
    // ceil(n/P) windows of P words; the tail window keeps its remnant
    val passages = transform(
      sequence(lit(0), floor((size(ws) - 1) / P).cast("int")),
      i => array_join(slice(ws, i * P + lit(1), lit(P)), " "))
    // Two-level count — the skew armor this operator specifically
    // needs (Lee et al. found single passages repeated millions of
    // times at web scale): first collapse WITHIN-doc occurrences
    // (doc-bounded, can't skew), so the hottest passage hash carries at
    // most one row per containing doc into the global count and its
    // count-back JOIN — which AQE skew-splits if even that is hot,
    // where a window partitioned by h could not be split.
    val perDoc = Tables.atComputeParallelism(documents)
      .select(col("doc_id"), explode(passages).as("para"))
      .select(col("doc_id"), md5(col("para")).as("h"))
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("k"))
    val global = perDoc.groupBy(col("h")).agg(sum(col("k")).as("c"))
    perDoc.join(global, "h")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("k")).as("n_paragraphs"),
        sum(when(col("c") > 1, col("k")).otherwise(0L)).as("n_dup_paragraphs"))
      .withColumn("dup_ratio",
        round(col("n_dup_paragraphs").cast("double") / col("n_paragraphs"), 4))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle: identical window cut via list slicing, identical
    * md5-count-join; CASTs pin BIGINT/DOUBLE to Spark's output types.
    */
  val paragraphDedupSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |paras AS (
      |  SELECT doc_id, md5(array_to_string(ws[(i*10+1):(i*10+10)], ' ')) AS h
      |  FROM w, unnest(range(0, CAST(floor((len(ws) - 1) / 10) AS BIGINT) + 1)) AS t(i)),
      |counts AS (SELECT h, count(*) AS c FROM paras GROUP BY 1)
      |SELECT p.doc_id,
      |  count(*) AS n_paragraphs,
      |  CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paragraphs,
      |  round(CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio
      |FROM paras p JOIN counts c USING (h)
      |GROUP BY p.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---- E20b: multi-scale passage dedup -------------------------------

  /** Window sizes for the multi-scale sweep. Fixed-width windows (E20)
    * only catch overlaps that align to ONE width; the real pipeline
    * tool for any-length exact-substring dedup is a suffix array (Lee
    * et al. 2022 §4). A multi-scale sweep narrows the gap cheaply:
    * short scales catch small repeated fragments, long scales catch
    * whole-passage/whole-doc copies, and the per-scale decay curve is
    * itself the useful audit signal (how much duplication lives at
    * which granularity). Scales are tuned to the corpus (10–99-word
    * docs): a scale beyond max doc length degenerates to whole-doc
    * hashing.
    */
  val passageScales = Seq(5, 10, 25, 50)

  /** E20b — corpus duplication profile per window scale, one scan.
    *
    * Scale shape: every (scale, window) pair is cut by pure array
    * expressions inside the scan — the scan is read ONCE for all
    * scales (a `flatten` over per-scale `transform`s, then one
    * explode); the count and count-back join run on (scale, hash)
    * keys, so the shuffle is O(Σ_s passages_s) and partitions by the
    * compound key — a hot passage at one scale can't skew another
    * scale's bucket. Same two-level count as E20: within-doc collapse
    * first, so the hottest (scale, hash) carries ≤1 row per containing
    * doc into the global count.
    */
  def passageScaleProfile(spark: SparkSession, dir: String): DataFrame =
    passageScaleProfileDf(Tables.documents(spark, dir))

  /** DataFrame-level core of E20b — any (doc_id, text) input. */
  def passageScaleProfileDf(documents: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    def cut(p: Int) = transform(
      sequence(lit(0), floor((size(ws) - 1) / p).cast("int")),
      i => struct(lit(p).as("scale"),
        md5(array_join(slice(ws, i * p + lit(1), lit(p)), " ")).as("h")))
    val allScales = flatten(array(passageScales.map(cut): _*))
    val perDoc = Tables.atComputeParallelism(documents)
      .select(col("doc_id"), explode(allScales).as("ph"))
      .select(col("doc_id"), col("ph.scale").as("scale"), col("ph.h").as("h"))
      .groupBy(col("scale"), col("doc_id"), col("h"))
      .agg(count(lit(1)).as("k"))
    val global = perDoc.groupBy(col("scale"), col("h")).agg(sum(col("k")).as("c"))
    perDoc.join(global, Seq("scale", "h"))
      .groupBy(col("scale"))
      .agg(
        sum(col("k")).as("n_passages"),
        sum(when(col("c") > 1, col("k")).otherwise(0L)).as("n_dup_passages"),
        countDistinct(when(col("c") > 1, col("doc_id"))).as("n_docs_affected"))
      .select(col("scale").cast("long").as("scale"),
        col("n_passages"), col("n_dup_passages"), col("n_docs_affected"),
        round(col("n_dup_passages").cast("double") / col("n_passages"), 4)
          .as("dup_ratio"))
      .orderBy(col("scale"))
  }

  /** DuckDB oracle: the same per-scale window cut via list slicing and
    * a VALUES scale list; occurrence rows count directly (Spark's
    * within-doc collapse then sum is arithmetically identical).
    */
  val passageScaleProfileSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |paras AS (
      |  SELECT doc_id, scale,
      |    md5(array_to_string(ws[(i*scale+1):(i*scale+scale)], ' ')) AS h
      |  FROM w CROSS JOIN (VALUES (5),(10),(25),(50)) AS s(scale),
      |    unnest(range(0, CAST(floor((len(ws) - 1) / scale) AS BIGINT) + 1)) AS t(i)),
      |counts AS (SELECT scale, h, count(*) AS c FROM paras GROUP BY 1, 2)
      |SELECT CAST(p.scale AS BIGINT) AS scale, count(*) AS n_passages,
      |  CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
      |  CAST(count(DISTINCT CASE WHEN c.c > 1 THEN p.doc_id END) AS BIGINT) AS n_docs_affected,
      |  round(CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_ratio
      |FROM paras p JOIN counts c USING (scale, h)
      |GROUP BY p.scale ORDER BY scale""".stripMargin

  // ---- E20c: any-length exact-overlap verifier -----------------------

  /** E20c — exact-overlap pair report: which doc pairs share a
    * contiguous word run of at least `minRun` words, and how long the
    * longest shared run is. This is the any-length complement to the
    * windowed passes (E20/E20b): fixed windows miss overlaps that
    * straddle window phase, and MinHash bands tuned for 0.7 Jaccard
    * miss a long run inside otherwise-different docs.
    *
    * Candidate generation is WINNOWING fingerprints (E11, Schleimer et
    * al. 2003) — the scheme's guarantee is exactly what's needed here:
    * two docs sharing a run of ≥ window+k-1 tokens ALWAYS share at
    * least one selected fingerprint, regardless of phase — and a run of
    * ≥ k+2·window-1 (= 10 here) tokens spans two full windows, so it
    * shares at least TWO. Candidates therefore require ≥2 shared
    * fingerprints: a single shared trigram hash is overwhelmingly a
    * coincidence, not a run (measured at sf0.1: 335k single-collision
    * pairs vs 8.2k with ≥2 — a 40× cut in LCS work with the guarantee
    * intact for minRun ≥ 10). Verification is the native lcs_words
    * kernel — O(words²) per CANDIDATE pair only.
    *
    * Scale shape: fingerprint buckets bound the pair fan-out (cap +
    * skew-immune two-sided join); the ≥2 count runs on the compound
    * (doc_a, doc_b) key; the LCS kernel runs inside the join projection
    * at compute parallelism; nothing is ever corpus².
    */
  def lcsOverlap(spark: SparkSession, dir: String, minRun: Int = 10): DataFrame =
    lcsOverlapDf(Tables.documents(spark, dir), minRun)

  /** Winnowing-fingerprint candidate pairs (doc_a < doc_b, ≥2 shared
    * fingerprints, bucket-capped) — the shared front half of E20c's
    * overlap report and E20d's span removal. Input carries
    * (doc_id, fps).
    */
  private def winnowingPairs(docs: DataFrame): DataFrame = {
    // one-pass capped-bucket mining (bucketPairs): the fingerprint
    // subtree evaluates ONCE instead of once per census/self-join side;
    // pairs emit with multiplicity so the ≥2-shared-fingerprint count
    // is unchanged
    val cand = docs.select(col("doc_id"), explode(col("fps")).as("fp"))
    bucketPairs(cand, col("fp"), col("doc_id"))
      .filter(col("a") < col("b"))
      .groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= 2)
      .select(col("doc_a"), col("doc_b"))
  }

  /** DataFrame-level core of E20c — any (doc_id, text) input. Words are
    * pre-hashed to xxhash64 longs once per row so the kernel's O(m·n)
    * inner loop compares primitives, not UTF8String bytes.
    */
  def lcsOverlapDf(documents: DataFrame, minRun: Int): DataFrame = {
    // two-step fingerprints: shingle hashes bind to a projected column
    // so the window-min lambda slices a materialized array (the fused
    // form re-hashed the doc once per window position — TextFns
    // rationale); EvalOnce keeps the optimizer from inlining the fps
    // alias into inferred/pushed predicates below the compute-width
    // exchange (the r14 one-task-scan-stage pathology)
    val docs = Tables.atComputeParallelism(documents)
      .withColumn("hs", HashFns.shingleHashes(col("text"), 3))
      .select(col("doc_id"),
        transform(split(col("text"), " "), w => xxhash64(w)).as("ws"),
        graft.plans.EvalOnce(
          graft.functions.TextFns.fingerprintsFromHashes(col("hs"))).as("fps"))
    val pairs = winnowingPairs(docs)
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("ws").as("ws_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("ws").as("ws_b")), "doc_b")
      // EvalOnce pins the O(m·n) kernel to THIS projection: without it,
      // predicate pushdown inlines the alias into the join condition and
      // the kernel runs twice per surviving pair (DedupSpec asserts the
      // single-occurrence property on the physical plan)
      .withColumn("lcs_words",
        graft.plans.EvalOnce(graft.plans.LcsWords(col("ws_a"), col("ws_b"))))
      .filter(col("lcs_words") >= minRun)
      .select(col("doc_a"), col("doc_b"), col("lcs_words").cast("long").as("lcs_words"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** E20c oracle (r13, was ☆): full replica of lcsOverlap. The
    * winnowing candidates rebuild from the E2 macros (positional FNV
    * 3-gram window hashes, SIGNED window mins like Spark's array_min,
    * bucket cap, ≥2-shared cut); the O(m·n) longest-common-RUN kernel
    * is a nested list fold — outer over rows of doc_a with the
    * accumulator carrying (previous DP row ++ running best), inner
    * building each row from the previous one (the recurrence has no
    * within-row dependency) — over the RAW token arrays, which is
    * hash-equivalent to the kernel's xxhash64-token comparison.
    */
  val lcsOverlapSql: String = {
    def row(acc: String) =
      s"""list_transform(range(1, len(tb.toks) + 1), j ->
         |        CASE WHEN ta.toks[CAST(e[1] AS INT)] = tb.toks[CAST(j AS INT)]
         |             THEN $acc[CAST(j AS INT)] + 1 ELSE 0 END)""".stripMargin
    sketchOracleMacros +
      s"""CREATE OR REPLACE TEMP TABLE lw_thl AS
         |SELECT doc_id, list(tok_hash(tok) ORDER BY pos) AS thl, count(*) AS len
         |FROM (SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
         |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
         |GROUP BY doc_id;
         |CREATE OR REPLACE TEMP TABLE lw_hs AS
         |SELECT doc_id, w, to_signed(fmix64(a3)) AS sh FROM (
         |  SELECT doc_id, w,
         |    CASE WHEN w + 2 <= len THEN xor(mul64(a2, 1099511628211::HUGEINT), thl[CAST(w + 2 AS INT)])
         |         ELSE a2 END AS a3
         |  FROM (
         |    SELECT doc_id, thl, len, w,
         |      CASE WHEN w + 1 <= len THEN xor(mul64(a1, 1099511628211::HUGEINT), thl[CAST(w + 1 AS INT)])
         |           ELSE a1 END AS a2
         |    FROM (
         |      SELECT doc_id, thl, len, w,
         |        xor(mul64(11400714819323198485::HUGEINT, 1099511628211::HUGEINT),
         |            thl[CAST(w AS INT)]) AS a1
         |      FROM lw_thl, unnest(range(1, greatest(len - 2, 1) + 1)) AS u(w))));
         |CREATE OR REPLACE TEMP TABLE lw_win AS
         |SELECT n.doc_id, t.i
         |FROM (SELECT doc_id, count(*) AS nw FROM lw_hs GROUP BY doc_id) n,
         |     unnest(range(1, greatest(n.nw - 3, 1) + 1)) AS t(i);
         |CREATE OR REPLACE TEMP TABLE lw_fps AS
         |SELECT DISTINCT doc_id, fp FROM (
         |  SELECT w.doc_id, w.i, min(h.sh) AS fp
         |  FROM lw_win w
         |  JOIN lw_hs h ON h.doc_id = w.doc_id AND h.w BETWEEN w.i AND w.i + 3
         |  GROUP BY w.doc_id, w.i);
         |CREATE OR REPLACE TEMP TABLE lw_pairs AS
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM (SELECT f.doc_id, f.fp FROM lw_fps f
         |      JOIN (SELECT fp FROM lw_fps GROUP BY fp
         |            HAVING count(*) BETWEEN 2 AND $maxBucketSize) ok USING (fp)) a
         |JOIN (SELECT f.doc_id, f.fp FROM lw_fps f
         |      JOIN (SELECT fp FROM lw_fps GROUP BY fp
         |            HAVING count(*) BETWEEN 2 AND $maxBucketSize) ok USING (fp)) b
         |  USING (fp)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 2;
         |SELECT doc_a, doc_b, CAST(lcs AS BIGINT) AS lcs_words FROM (
         |  SELECT p.doc_a, p.doc_b,
         |    (list_reduce(
         |      list_prepend(
         |        list_append(list_transform(range(0, len(tb.toks) + 1), x -> 0), 0),
         |        list_transform(range(1, len(ta.toks) + 1), i -> [i])),
         |      (acc, e) -> list_append(
         |        list_prepend(0, ${row("acc")}),
         |        greatest(acc[CAST(len(tb.toks) + 2 AS INT)],
         |          coalesce(list_max(${row("acc")}), 0))))
         |    )[CAST(len(tb.toks) + 2 AS INT)] AS lcs
         |  FROM lw_pairs p
         |  JOIN (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) ta
         |    ON ta.doc_id = p.doc_a
         |  JOIN (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) tb
         |    ON tb.doc_id = p.doc_b)
         |WHERE lcs >= 10
         |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** E39 — MinHash-LSH parameter planner (the design table every LSH
    * deployment derives before committing to a banding; public theory:
    * Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" §3.4): for
    * each (bands, rows) factorization of the 64-wide E2 signature, the
    * S-curve threshold (1/b)^(1/r) and the candidate-collision
    * probability 1-(1-s^r)^b at representative Jaccard levels — the
    * false-positive (s below threshold) and false-negative (s above)
    * rates the banding trades. Pure plan-time arithmetic on |divisors|
    * rows; `deployed` marks E2's shipped 16×4 point, chosen so the
    * curve's knee sits at the 0.7 near-dup threshold.
    */
  def lshPlanner(spark: SparkSession, dir: String, nSig: Int = 64): DataFrame = {
    val s = spark
    import s.implicits._
    def pAt(sim: Double) = round(
      lit(1.0) - pow(lit(1.0) - pow(lit(sim), col("rows_per_band")), col("bands")), 6)
    (0 to 6).map(1 << _).filter(nSig % _ == 0)
      .map(b => (b.toLong, (nSig / b).toLong)).toDF("bands", "rows_per_band")
      .withColumn("s_threshold",
        round(pow(lit(1.0) / col("bands"), lit(1.0) / col("rows_per_band")), 6))
      .withColumn("p_at_050", pAt(0.5))
      .withColumn("p_at_070", pAt(0.7))
      .withColumn("p_at_090", pAt(0.9))
      .withColumn("deployed", col("bands") === 16)
      .orderBy(col("bands"))
  }

  val lshPlannerSql: String =
    """WITH f AS (
      |  SELECT CAST(b AS BIGINT) AS bands, CAST(64 // b AS BIGINT) AS rows_per_band
      |  FROM (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS b))
      |SELECT bands, rows_per_band,
      |  round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS s_threshold,
      |  round(1.0 - pow(1.0 - pow(0.5, rows_per_band), bands), 6) AS p_at_050,
      |  round(1.0 - pow(1.0 - pow(0.7, rows_per_band), bands), 6) AS p_at_070,
      |  round(1.0 - pow(1.0 - pow(0.9, rows_per_band), bands), 6) AS p_at_090,
      |  bands = 16 AS deployed
      |FROM f
      |ORDER BY bands""".stripMargin

  /** Winnowing-bucket candidate statistics over the REAL (xxhash64)
    * fingerprint pipeline — the §8 scaling instrument behind the E20c/
    * E20d "40× prune" claim: how many buckets are usable, how many
    * candidate pairs the buckets admit, and how many survive the ≥2
    * shared-fingerprint cut that gates the O(m·n) LCS kernel. One row.
    */
  def candidateStats(documents: DataFrame): DataFrame = {
    // two-step + EvalOnce: see lcsOverlapDf
    val docs = Tables.atComputeParallelism(documents)
      .withColumn("hs", HashFns.shingleHashes(col("text"), 3))
      .select(col("doc_id"),
        graft.plans.EvalOnce(
          graft.functions.TextFns.fingerprintsFromHashes(col("hs"))).as("fps"))
    val cand = parkTemp(
      docs.select(col("doc_id"), explode(col("fps")).as("fp")), "candstats")
    val buckets = parkTemp(
      cand.groupBy(col("fp")).agg(count(lit(1)).as("bn")), "candstats-buckets")
    val inBucket = cand.join(
      buckets.filter(col("bn").between(2, maxBucketSize)).select(col("fp")), "fp")
    val pairs = inBucket.select(col("fp"), col("doc_id").as("doc_a"))
      .join(inBucket.select(col("fp"), col("doc_id").as("doc_b")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
    documents.select(col("doc_id")).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(buckets.agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("bn") === 1, 1L).otherwise(0L)).as("singleton_buckets"),
        sum(when(col("bn") > maxBucketSize, 1L).otherwise(0L)).as("capped_buckets"))))
      .crossJoin(broadcast(pairs.agg(
        count(lit(1)).as("candidate_pairs"),
        sum(when(col("shared_fps") >= 2, 1L).otherwise(0L)).as("ge2_pairs"))))
  }

  /** E20e — dedup-candidate audit as a QUERY (the pre-flight a corpus
    * operator runs before paying for E20c/E20d: bucket usability and
    * the single-collision vs ≥2-shared pair split — the measured prune
    * factor). Runs on the md5 winnowing variant (E11's q_fingerprint
    * parity table) so every count is DuckDB-verifiable; the xxhash64
    * production pipeline has the same structure (candidateStats above)
    * — collisions aside, the counts coincide.
    */
  def dedupCandidateAudit(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val hs = transform(
      sequence(lit(1), greatest(size(words) - 2, lit(1))),
      i => md5(concat_ws(" ",
        try_element_at(words, i), try_element_at(words, i + 1),
        try_element_at(words, i + 2))))
    // materialize hs behind an EvalOnce alias boundary: inlined into the
    // winnowing lambda it would re-evaluate the md5 array per WINDOW
    // element — O(words²) md5s per doc (measured 242 s vs 4 s at sf0.1)
    val docs = Tables.atComputeParallelism(Tables.documents(spark, dir))
      .select(col("doc_id"), graft.plans.EvalOnce(hs).as("hs"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("hs")) - 3, lit(1))),
          i => array_min(slice(col("hs"), i, lit(4))))).as("fps"))
    // fingerprint-MEMOIZED park (r14; r13 re-parked on every call and
    // the query's idle cost drifted 1.6→1.8→2.4 s): the posting table
    // feeds FOUR plan subtrees (bucket agg + both self-join sides +
    // its own derivation) — without the cut each one re-runs the md5
    // winnowing explode — and both tables are pure functions of the
    // documents table, so they qualify for the ensureIvfIndex
    // contract: first call per data content pays the explode, every
    // later one is a parquet read; the fingerprint (file listing
    // digest) invalidates on regenerated data (DedupSpec asserts it)
    val dk = graft.sources.Scratch.digest(dir)
    val gen = graft.sources.Scratch.digest(
      Similarity.dataFingerprintFor(spark, dir, "documents.parquet"))
    val cand = ensurePark(spark, s"graft-park-candaudit-v1-$dk", gen)(
      docs.select(col("doc_id"), explode(col("fps")).as("fp")))
    val buckets = ensurePark(spark, s"graft-park-candbuckets-v1-$dk", gen)(
      cand.groupBy(col("fp")).agg(count(lit(1)).as("bn")))
    val inBucket = cand.join(
      buckets.filter(col("bn").between(2, maxBucketSize)).select(col("fp")), "fp")
    val pairs = inBucket.select(col("fp"), col("doc_id").as("doc_a"))
      .join(inBucket.select(col("fp"), col("doc_id").as("doc_b")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
    Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(buckets.agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("bn") === 1, 1L).otherwise(0L)).as("singleton_buckets"),
        sum(when(col("bn") > maxBucketSize, 1L).otherwise(0L)).as("capped_buckets"))))
      .crossJoin(broadcast(pairs.agg(
        count(lit(1)).as("candidate_pairs"),
        sum(when(col("shared_fps") >= 2, 1L).otherwise(0L)).as("ge2_pairs"))))
  }

  val dedupCandidateAuditSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |h AS (
       |  -- array_to_string over the slice, not ||: a doc with <3 words
       |  -- must hash the PARTIAL gram (Spark's concat_ws skips missing
       |  -- words), while || would propagate NULL and mint a NULL bucket
       |  SELECT doc_id, list_transform(range(greatest(len(w) - 2, 1)),
       |    i -> md5(array_to_string(w[i+1:i+3], ' '))) AS hs
       |  FROM t),
       |wins AS (
       |  SELECT doc_id, list_distinct(list_transform(range(greatest(len(hs) - 3, 1)),
       |    i -> list_aggregate(hs[i+1:i+4], 'min'))) AS fps
       |  FROM h),
       |fps AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
       |buckets AS (SELECT fp, count(*) AS bn FROM fps GROUP BY 1),
       |ib AS (SELECT f.fp, f.doc_id FROM fps f
       |       JOIN (SELECT fp FROM buckets WHERE bn BETWEEN 2 AND $maxBucketSize) ok USING (fp)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM ib a JOIN ib b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT
       |  (SELECT count(*) FROM t) AS n_docs,
       |  (SELECT count(*) FROM buckets) AS n_buckets,
       |  (SELECT CAST(coalesce(sum(CASE WHEN bn = 1 THEN 1 END), 0) AS BIGINT)
       |     FROM buckets) AS singleton_buckets,
       |  (SELECT CAST(coalesce(sum(CASE WHEN bn > $maxBucketSize THEN 1 END), 0) AS BIGINT)
       |     FROM buckets) AS capped_buckets,
       |  (SELECT count(*) FROM pairs) AS candidate_pairs,
       |  (SELECT CAST(coalesce(sum(CASE WHEN shared >= 2 THEN 1 END), 0) AS BIGINT)
       |     FROM pairs) AS ge2_pairs""".stripMargin

  // ---- E20d: exact-substring dedup REMOVAL ---------------------------

  /** E20d — exact-substring dedup with span REMOVAL (public anchor:
    * Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better" — cut every duplicated run, keep ONE copy). E20c
    * reports which pairs share a run; this operator goes the rest of
    * the way: locate every shared run (positional `lcs_spans` kernel),
    * keep the copy in the LOWEST-id doc, and CUT the span from every
    * later doc — per doc, overlapping cut spans merge first (classic
    * gaps-and-islands: one window pass, no UDF), then the words
    * outside every island are kept via higher-order `filter`/`exists`
    * (islands per doc are few — the lambda is O(words × islands)).
    *
    * Scale shape: candidates/verification identical to E20c (winnowing
    * buckets, never corpus²); span merging windows per doc_id (key-
    * partitioned); the cut applies in the scan projection. Determinism:
    * the kernel's first-scan-order emission + sorted island fold make
    * byte-identical reruns — the idempotence the spec pins (a second
    * pass over the cleaned corpus finds nothing ≥ minRun).
    */
  /** Fingerprint table over (doc_id, text) — split out so the fixpoint
    * caches it and recomputes ONLY changed docs between minings.
    */
  private def substringFps(documents: DataFrame): DataFrame =
    // two-step + EvalOnce: see lcsOverlapDf
    Tables.atComputeParallelism(documents)
      .withColumn("hs", HashFns.shingleHashes(col("text"), 3))
      .select(col("doc_id"),
        graft.plans.EvalOnce(
          graft.functions.TextFns.fingerprintsFromHashes(col("hs"))).as("fps"))

  /** Winnowing candidate mining from a fingerprint table; `touching`
    * (when given) keeps only pairs with at least one member in the set
    * — the certification pass needs nothing else, because a pair of
    * two UNCHANGED docs was already cut to completion (its texts are
    * byte-identical to when its spans were last verified). Split out
    * so the fixpoint mines once and iterates on the cached pair list —
    * re-mining the whole corpus every round measured 176× on 10× data
    * in the §8h scaling study (mining, not the DP, dominated).
    */
  private def substringCandidatePairs(fps: DataFrame,
                                      touching: Option[DataFrame] = None): DataFrame = {
    val raw = winnowingPairs(fps)
    touching match {
      case None => raw
      case Some(ch) =>
        // shuffle_hash: these internal frames cross localCheckpoint
        // boundaries, and a checkpointed scan on a broadcast build side
        // trips Spark's doExecuteBroadcast hole (observed on this loop)
        raw
          .join(ch.select(col("doc_id").as("doc_a"), lit(1).as("t_a")).hint("shuffle_hash"), Seq("doc_a"), "left")
          .join(ch.select(col("doc_id").as("doc_b"), lit(1).as("t_b")).hint("shuffle_hash"), Seq("doc_b"), "left")
          .filter(col("t_a").isNotNull || col("t_b").isNotNull)
          .drop("t_a", "t_b")
    }
  }

  /** Verify + cut against a GIVEN candidate pair list; `restrictTo`
    * narrows the expensive lcs_spans verify to pairs touching a changed
    * doc (an unchanged pair reproduces its prior verdict, so skipping
    * it is exact). Equi-join flags, not broadcast — the changed set
    * starts corpus-sized in the worst case and shrinks geometrically.
    */
  private def substringCutPass(documents: DataFrame, rawPairs: DataFrame,
                               minRun: Int,
                               restrictTo: Option[DataFrame]): DataFrame = {
    val docs = Tables.atComputeParallelism(documents)
      .select(col("doc_id"),
        transform(split(col("text"), " "), w => xxhash64(w)).as("ws"))
    val pairs = restrictTo match {
      case None => rawPairs
      case Some(ch) =>
        rawPairs
          .join(ch.select(col("doc_id").as("doc_a"), lit(1).as("ch_a")).hint("shuffle_hash"), Seq("doc_a"), "left")
          .join(ch.select(col("doc_id").as("doc_b"), lit(1).as("ch_b")).hint("shuffle_hash"), Seq("doc_b"), "left")
          .filter(col("ch_a").isNotNull || col("ch_b").isNotNull)
          .drop("ch_a", "ch_b")
    }
    val verified = pairs.hint("shuffle_hash")
      .join(docs.select(col("doc_id").as("doc_a"), col("ws").as("ws_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("ws").as("ws_b")), "doc_b")
      // EvalOnce: same single-evaluation discipline as E20c's kernel.
      // ALL maximal runs ≥ minRun come back at once (Lee et al. cut
      // every duplicated substring in one pass — the one-longest-span
      // kernel forced one fixpoint round per extra run, §8h)
      .withColumn("spans",
        graft.plans.EvalOnce(graft.plans.LcsSpans(col("ws_a"), col("ws_b"), minRun)))
      .filter(size(col("spans")) > 0)
    // the lower-id doc keeps its copy; the later doc loses every [s, e)
    val spans = verified
      .select(col("doc_b").as("doc_id"), explode(col("spans")).as("sp"))
      .select(col("doc_id"),
        (col("sp.b_end") - col("sp.len")).as("s"), col("sp.b_end").as("e"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val cuts = spans
      .withColumn("prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        (col("prev_max_e").isNull || col("s") > col("prev_max_e")).cast("int"))
      .withColumn("island", sum(col("new_island")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cut"))
    documents.join(cuts, Seq("doc_id"), "left")
      .withColumn("words", split(col("text"), " "))
      .withColumn("kept",
        when(col("cut").isNull, col("words")).otherwise(
          filter(col("words"), (word, i) =>
            !exists(col("cut"), s =>
              i >= s.getField("s") && i < s.getField("e")))))
      .select(col("doc_id"),
        coalesce(size(col("cut")), lit(0)).cast("long").as("n_cuts"),
        (size(col("words")) - size(col("kept"))).cast("long").as("words_removed"),
        size(col("kept")).cast("long").as("n_words_after"),
        concat_ws(" ", col("kept")).as("text_clean"))
  }

  /** Single-pass removal (mine + verify + cut in one): the spec-facing
    * form and the building block the fixpoint certifies with.
    */
  def substringRemovalDf(documents: DataFrame, minRun: Int = 10): DataFrame =
    substringCutPass(documents, substringCandidatePairs(substringFps(documents)),
      minRun, None)

  /** E20d fixpoint — iterate the single-pass removal to convergence
    * (bounded rounds). One pass cuts only the LONGEST shared span per
    * candidate pair, so a document carrying several disjoint duplicated
    * runs against the same keeper retains all but the longest after one
    * pass; production dedup (Lee et al. 2022 §4.2 runs suffix-array
    * passes the same way) iterates until no span ≥ minRun remains.
    *
    * Loop shape (revised after the §8h sf1 scaling study measured the
    * re-mine-every-round form at 176× on 10× data — candidate MINING,
    * not the DP, dominated): mine the winnowing pair list ONCE, then
    * iterate verify+cut on that CACHED list — round ≥2 additionally
    * narrows the lcs_spans verify to pairs touching a doc cut in the
    * previous round (an unchanged pair reproduces its verdict, so
    * skipping it is exact). When a cut round comes up empty, one FULL
    * re-mine certifies convergence: cutting can in principle seam two
    * distant words into a fresh duplicated run the old pair list never
    * saw, so the certificate is a fresh mining finding nothing — if it
    * DOES find cuts, the loop continues on the new pair list. Benign
    * corpora therefore pay exactly two minings (one working + one
    * certifying) instead of one per round. Each round
    * `localCheckpoint`s its outputs to keep the plan constant-size;
    * `maxRounds` bounds the cut rounds and `converged` reports whether
    * the bound bit.
    */
  def substringRemovalFixpointDf(documents: DataFrame, minRun: Int = 10,
                                 maxRounds: Int = 4): DataFrame = {
    var cur = documents.select(col("doc_id"), col("text"))
    var acc: DataFrame = null
    var rounds = 0
    var converged = false
    var miningsLeft = maxRounds // certification minings share the bound
    // LAZY checkpoints throughout the loop (r14): every eager
    // localCheckpoint was its own job barrier — fps, mining, cut pass
    // and the convergence count each paid a full scheduler round trip
    // (11 sequential jobs for the typical one-cut corpus). eager=false
    // keeps the plan-truncation property but lets the NEXT action
    // materialize the checkpoint as part of its own job, so fps +
    // mining + cut + count fuse into one job per round (~4 jobs total)
    // — the same partitions move, scheduled once instead of four times.
    var fpsCur = substringFps(cur).localCheckpoint(eager = false)
    // None = first mining (all pairs); afterwards only pairs touching a
    // doc changed since the LAST mining need attention — and only those
    // docs need their fingerprints recomputed
    var touching: Option[DataFrame] = None
    while (!converged && rounds < maxRounds && miningsLeft > 0) {
      miningsLeft -= 1
      val pairs = substringCandidatePairs(fpsCur, touching)
        .localCheckpoint(eager = false)
      var restrict: Option[DataFrame] = None
      var changedThisMining: DataFrame = null
      var cutsThisMining = 0L
      var innerActive = true
      while (innerActive && rounds < maxRounds) {
        val pass = substringCutPass(cur, pairs, minRun, restrict)
          .localCheckpoint(eager = false)
        // the materializing action for pass (and, transitively, for the
        // pending fps/pairs checkpoints): one job runs the whole round
        val cut = pass.agg(coalesce(sum(col("n_cuts")), lit(0L))).head.getLong(0)
        if (cut == 0L) innerActive = false
        else {
          rounds += 1
          cutsThisMining += cut
          val totals = pass.select(col("doc_id"), col("n_cuts"), col("words_removed"))
          acc =
            if (acc == null) totals
            else acc.unionAll(totals).groupBy(col("doc_id"))
              .agg(sum(col("n_cuts")).as("n_cuts"),
                sum(col("words_removed")).as("words_removed"))
              .localCheckpoint(eager = false)
          val ch = pass.filter(col("n_cuts") > 0).select(col("doc_id"))
          restrict = Some(ch)
          changedThisMining =
            if (changedThisMining == null) ch
            else changedThisMining.unionAll(ch).distinct()
          // pass is already checkpointed — selecting from it keeps the
          // plan constant-size with no further materialization
          cur = pass.select(col("doc_id"), col("text_clean").as("text"))
        }
      }
      // a mining whose FIRST pass cut nothing is the convergence
      // certificate; one that cut and then drained sends the loop back
      // for a fresh (certifying) mining over the changed frontier
      if (cutsThisMining == 0L) converged = true
      else {
        val changed = changedThisMining.select(col("doc_id"))
        fpsCur = fpsCur
          .join(changed.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
          .unionByName(substringFps(
            cur.join(changed.hint("shuffle_hash"), Seq("doc_id"), "left_semi")))
          .localCheckpoint(eager = false)
        touching = Some(changed)
      }
    }
    val totals =
      if (acc == null)
        documents.select(col("doc_id"), lit(0L).as("n_cuts"), lit(0L).as("words_removed"))
      else acc
    cur
      .select(col("doc_id"), col("text").as("text_clean"),
        when(col("text") === "", 0L)
          .otherwise(size(split(col("text"), " ")).cast("long")).as("n_words_after"))
      .join(totals, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cuts"), lit(0L)).as("n_cuts"),
        coalesce(col("words_removed"), lit(0L)).as("words_removed"),
        col("n_words_after"),
        lit(rounds.toLong).as("rounds"),
        lit(converged).as("converged"),
        col("text_clean"))
  }

  /** ☆ entry — corpus-wide removal report at the FIXPOINT (text_clean
    * itself stays out of the dump; the counts + round count pin the cut
    * set and the convergence behavior).
    */
  def dedupSubstringRemoval(spark: SparkSession, dir: String,
                            minRun: Int = 10): DataFrame =
    substringRemovalFixpointDf(Tables.documents(spark, dir), minRun)
      .select(col("doc_id"), col("n_cuts"), col("words_removed"),
        col("n_words_after"), col("rounds"), col("converged"))
      .orderBy(col("doc_id"))

  /** E20d oracle (r13, was ☆): full replica of the fixpoint removal at
    * the depth this corpus exercises (one cutting pass + the empty
    * drain + the empty certification mining — rounds = 1). The spans
    * kernel's "maximal run" emission is exactly the gaps-and-islands
    * structure of the word-match relation along DIAGONALS (i − j):
    * every island of length ≥ minRun emits (len, b_end) at its
    * terminal cell, so islands-by-diagonal reproduce LcsSpans without
    * a DP. Pass-2 (the P1 pair list against the cleaned texts) and the
    * certification mining (fresh winnowing of the cleaned corpus) are
    * both COMPUTED and must come back empty: `rounds`/`converged`
    * poison to NULL otherwise, so a corpus needing more rounds fails
    * the hash loudly instead of silently passing.
    */
  val dedupSubstringSql: String = {
    // winnowing-candidate block over a (doc_id, text) table `src`,
    // emitting <pfx>_pairs (doc_a < doc_b, >=2 shared, bucket-capped) —
    // the same replica as lcsOverlapSql, prefix-parameterized
    def winnow(pfx: String, src: String): String =
      s"""CREATE OR REPLACE TEMP TABLE ${pfx}_thl AS
         |SELECT doc_id, list(tok_hash(tok) ORDER BY pos) AS thl, count(*) AS len
         |FROM (SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
         |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src))
         |GROUP BY doc_id;
         |CREATE OR REPLACE TEMP TABLE ${pfx}_hs AS
         |SELECT doc_id, w, to_signed(fmix64(a3)) AS sh FROM (
         |  SELECT doc_id, w,
         |    CASE WHEN w + 2 <= len THEN xor(mul64(a2, 1099511628211::HUGEINT), thl[CAST(w + 2 AS INT)])
         |         ELSE a2 END AS a3
         |  FROM (
         |    SELECT doc_id, thl, len, w,
         |      CASE WHEN w + 1 <= len THEN xor(mul64(a1, 1099511628211::HUGEINT), thl[CAST(w + 1 AS INT)])
         |           ELSE a1 END AS a2
         |    FROM (
         |      SELECT doc_id, thl, len, w,
         |        xor(mul64(11400714819323198485::HUGEINT, 1099511628211::HUGEINT),
         |            thl[CAST(w AS INT)]) AS a1
         |      FROM ${pfx}_thl, unnest(range(1, greatest(len - 2, 1) + 1)) AS u(w))));
         |CREATE OR REPLACE TEMP TABLE ${pfx}_win AS
         |SELECT n.doc_id, t.i
         |FROM (SELECT doc_id, count(*) AS nw FROM ${pfx}_hs GROUP BY doc_id) n,
         |     unnest(range(1, greatest(n.nw - 3, 1) + 1)) AS t(i);
         |CREATE OR REPLACE TEMP TABLE ${pfx}_fps AS
         |SELECT DISTINCT doc_id, fp FROM (
         |  SELECT w.doc_id, w.i, min(h.sh) AS fp
         |  FROM ${pfx}_win w
         |  JOIN ${pfx}_hs h ON h.doc_id = w.doc_id AND h.w BETWEEN w.i AND w.i + 3
         |  GROUP BY w.doc_id, w.i);
         |CREATE OR REPLACE TEMP TABLE ${pfx}_pairs AS
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM (SELECT f.doc_id, f.fp FROM ${pfx}_fps f
         |      JOIN (SELECT fp FROM ${pfx}_fps GROUP BY fp
         |            HAVING count(*) BETWEEN 2 AND $maxBucketSize) ok USING (fp)) a
         |JOIN (SELECT f.doc_id, f.fp FROM ${pfx}_fps f
         |      JOIN (SELECT fp FROM ${pfx}_fps GROUP BY fp
         |            HAVING count(*) BETWEEN 2 AND $maxBucketSize) ok USING (fp)) b
         |  USING (fp)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 2;""".stripMargin
    // LcsSpans replica: diagonal islands >= minRun of the word-match
    // relation between `pairs` over word table `wtab`
    def spans(pfx: String, pairs: String, wtab: String): String =
      s"""CREATE OR REPLACE TEMP TABLE ${pfx}_spans AS
         |SELECT doc_b AS doc_id, b_end - len AS s, b_end AS e FROM (
         |  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS len,
         |         CAST(max(j) AS BIGINT) AS b_end
         |  FROM (SELECT doc_a, doc_b, d, j,
         |          j - row_number() OVER (PARTITION BY doc_a, doc_b, d ORDER BY j) AS grp
         |        FROM (SELECT p.doc_a, p.doc_b, a.pos - b.pos AS d, b.pos AS j
         |              FROM $pairs p
         |              JOIN $wtab a ON a.doc_id = p.doc_a
         |              JOIN $wtab b ON b.doc_id = p.doc_b AND b.w = a.w))
         |  GROUP BY doc_a, doc_b, d, grp
         |  HAVING count(*) >= 10);""".stripMargin
    sketchOracleMacros +
      s"""CREATE OR REPLACE TEMP TABLE ds_t0 AS SELECT doc_id, text FROM documents;
         |${winnow("ds1", "ds_t0")}
         |CREATE OR REPLACE TEMP TABLE ds_w0 AS
         |SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS w
         |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM ds_t0);
         |${spans("ds1", "ds1_pairs", "ds_w0")}
         |CREATE OR REPLACE TEMP TABLE ds_cut1 AS
         |SELECT doc_id, island, min(s) AS s, max(e) AS e FROM (
         |  SELECT doc_id, s, e,
         |    sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY s, e) AS island
         |  FROM (SELECT doc_id, s, e,
         |          max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
         |        FROM ds1_spans))
         |GROUP BY doc_id, island;
         |CREATE OR REPLACE TEMP TABLE ds_stats1 AS
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cuts,
         |       CAST(sum(e - s) AS BIGINT) AS words_removed
         |FROM ds_cut1 GROUP BY doc_id;
         |CREATE OR REPLACE TEMP TABLE ds_t1 AS
         |SELECT d.doc_id,
         |  CASE WHEN st.doc_id IS NULL THEN d.text ELSE coalesce(k.txt, '') END AS text
         |FROM ds_t0 d
         |LEFT JOIN ds_stats1 st USING (doc_id)
         |LEFT JOIN (
         |  SELECT w.doc_id, string_agg(w.w, ' ' ORDER BY w.pos) AS txt
         |  FROM ds_w0 w
         |  JOIN ds_stats1 s2 ON s2.doc_id = w.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM ds_cut1 c
         |                    WHERE c.doc_id = w.doc_id
         |                      AND w.pos - 1 >= c.s AND w.pos - 1 < c.e)
         |  GROUP BY w.doc_id) k USING (doc_id);
         |CREATE OR REPLACE TEMP TABLE ds_w1 AS
         |SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS w
         |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM ds_t1);
         |${spans("ds2", "ds1_pairs", "ds_w1")}
         |${winnow("ds3", "ds_t1")}
         |${spans("ds3", "ds3_pairs", "ds_w1")}
         |CREATE OR REPLACE TEMP TABLE ds_halt AS
         |SELECT CASE WHEN (SELECT count(*) FROM ds2_spans) = 0
         |             AND (SELECT count(*) FROM ds3_spans) = 0
         |            THEN 1 ELSE NULL END AS ok;
         |SELECT d.doc_id,
         |  coalesce(st.n_cuts, 0) AS n_cuts,
         |  coalesce(st.words_removed, 0) AS words_removed,
         |  CASE WHEN t.text = '' THEN 0
         |       ELSE CAST(len(string_split(t.text, ' ')) AS BIGINT) END AS n_words_after,
         |  CAST(h.ok AS BIGINT) AS rounds,
         |  CAST(h.ok = 1 AS BOOLEAN) AS converged
         |FROM ds_t0 d
         |JOIN ds_t1 t USING (doc_id)
         |LEFT JOIN ds_stats1 st USING (doc_id)
         |CROSS JOIN ds_halt h
         |ORDER BY d.doc_id""".stripMargin
  }

  /** E22 core — SemDeDup's within-cell keep rule (public anchor: Abbas
    * et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", arXiv:2303.09540). Input: one row
    * per vector with its cell assignment and centroid similarity
    * `c_sim`. A vector is DROPPED iff some same-cell neighbor above the
    * cosine threshold ranks more keepable — the paper keeps the member
    * with the LOWEST centroid similarity (retains the most diverse
    * representative), tie-broken on id. The keep rule is a per-row
    * existential test: one cell-keyed left-semi join mines the dropped
    * set, one left-anti subtracts it — no connected components, exactly
    * the paper's per-neighborhood semantics.
    *
    * Candidate pairs are CELL-bounded: the self-join is an equi-join on
    * cell, so pair volume is Σ|cell|² — at 100 TB, nCells scales with
    * the corpus (the paper runs 50k clusters on LAION) to keep cells
    * bounded, and the equi-join shuffles each cell to one task (AQE
    * skew-split handles hot cells).
    */
  def semanticDedupWithin(cells: DataFrame, tau: Double): DataFrame = {
    val b = cells.select(col("cell").as("b_cell"), col("n_id").as("b_id"),
      col("n_emb").as("b_emb"), col("c_sim").as("b_cs"))
    val dropped = cells.join(b,
        col("cell") === col("b_cell") && col("n_id") =!= col("b_id") &&
          CosineSim(col("n_emb"), col("b_emb")) >= tau &&
          (col("b_cs") < col("c_sim") ||
            (col("b_cs") === col("c_sim") && col("b_id") < col("n_id"))),
        "left_semi")
      .select(col("n_id"))
    cells.join(dropped, Seq("n_id"), "left_anti")
      .select(col("n_id"), col("cell"), col("c_sim"))
      .orderBy(col("n_id"))
  }

  /** E22 — semantic dedup over the embeddings corpus: the E7 IVF cell
    * machinery supplies the k-means cells (seeded, deterministic), the
    * centroid-similarity ranking, and the cell-bounded candidate
    * generation. τ = 0.4 is calibrated to this table's planted near-dup
    * level (the same threshold E5's pairwise kernel mines at; real
    * text/image embeddings run ~0.9+). ★ (r13, was ☆): the
    * deterministic-kmeans replay (semanticDedupSql) oracles the cells
    * AND the keep rule; SemDedupSpec still pins the keep rule on
    * planted cells and the end-to-end path on real data.
    */
  def semanticDedup(spark: SparkSession, dir: String, nCells: Int = -1,
                    tau: Double = 0.4): DataFrame = {
    CosineSim.register(spark)
    val nc =
      if (nCells > 0) nCells
      else Similarity.autoCells(Similarity.corpusN(spark, dir))
    val (corpusCells, centroids) = Similarity.ivfParts(spark, dir, nc)
    val cells = corpusCells.join(broadcast(centroids), "cell")
      .withColumn("c_sim", round(CosineSim(col("n_emb"), col("centroid")), 6))
      .select(col("cell"), col("n_id"), col("n_emb"), col("c_sim"))
    semanticDedupWithin(cells, tau)
  }

  /** E22, benched entry: same semantics served from the MEMOIZED
    * persisted IVF index (Similarity.ensureIvfIndex) — only the first
    * invocation per data dir pays the k-means fit; SemDeDup in
    * production runs over a prebuilt cell assignment exactly like
    * this. Cell assignments and centroids are identical to
    * semanticDedup's (same seeded build wrote them).
    */
  def semanticDedupIndexed(spark: SparkSession, dir: String,
                           tau: Double = 0.4): DataFrame = {
    CosineSim.register(spark)
    val path = Similarity.ensureIvfIndex(spark, dir)
    val corpusCells = spark.read.parquet(s"$path/cells")
    val centroids = spark.read.parquet(s"$path/centroids")
    val cells = corpusCells.join(broadcast(centroids), "cell")
      .withColumn("c_sim", round(CosineSim(col("n_emb"), col("centroid")), 6))
      .select(col("cell"), col("n_id"), col("n_emb"), col("c_sim"))
    semanticDedupWithin(cells, tau)
  }

  /** E22 oracle (r13, was ☆): the deterministic-kmeans replay supplies
    * the cells (Similarity.kmeansReplaySqlPrefix), c_sim re-derives
    * against the float-cast centroid table, and the keep rule is the
    * identical existential test as a same-cell NOT EXISTS.
    */
  val semanticDedupSql: String =
    s"""${Similarity.kmeansReplaySqlPrefix()}
       |CREATE OR REPLACE TEMP TABLE sd_cells AS
       |SELECT k.cell, k.n_id, e.emb AS n_emb,
       |       round(kcos(e.emb, c.centf), 6) AS c_sim
       |FROM km_cells k
       |JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings) e
       |  ON e.vec_id = k.n_id
       |JOIN km_centf c USING (cell);
       |CREATE OR REPLACE TEMP TABLE sd_drop AS
       |SELECT DISTINCT a.n_id
       |FROM sd_cells a JOIN sd_cells b
       |  ON b.cell = a.cell AND b.n_id <> a.n_id
       |WHERE kcos(a.n_emb, b.n_emb) >= CAST(0.4 AS DOUBLE)
       |  AND (b.c_sim < a.c_sim OR (b.c_sim = a.c_sim AND b.n_id < a.n_id));
       |SELECT n_id, cell, c_sim FROM sd_cells
       |WHERE n_id NOT IN (SELECT n_id FROM sd_drop)
       |ORDER BY n_id""".stripMargin

  // ---- E46: cross-corpus near-dup ------------------------------------

  /** The "reference corpus" half of the cross-corpus contracts below:
    * the curated sources an incoming crawl is deduped AGAINST (the
    * CC-vs-Wikipedia / new-crawl-vs-kept-corpus split every multi-source
    * pipeline runs).
    */
  val refSources: Seq[String] = (0 to 4).map(i => s"src$i")

  /** E46 — cross-corpus near-dup: flag documents OUTSIDE the reference
    * sources that near-duplicate a document INSIDE them (dedup a new
    * crawl against the corpus you already keep — the first question
    * when merging sources, and the fuzzy complement of E16's n-gram
    * contamination check). Rides E2's full MinHash+LSH pipeline
    * unchanged — band buckets already co-locate candidates from BOTH
    * corpora, so "cross" is a residual filter on the verified pairs,
    * not a second mining pass; the source lookup joins the pair list
    * (≪ corpus) back to the documents table.
    */
  def crossCorpusDedup(spark: SparkSession, dir: String,
                       threshold: Double = 0.7): DataFrame = {
    val pairs = minhashPairs(spark, dir, threshold)
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val aRef = col("src_a").isin(refSources.map(x => x: Any): _*)
    val bRef = col("src_b").isin(refSources.map(x => x: Any): _*)
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .filter(aRef =!= bRef)
      .select(
        when(aRef, col("doc_b")).otherwise(col("doc_a")).as("doc_id"),
        when(aRef, col("src_b")).otherwise(col("src_a")).as("source"),
        when(aRef, col("doc_a")).otherwise(col("doc_b")).as("ref_doc"),
        col("jaccard"))
      .orderBy(col("doc_id"), col("ref_doc"))
  }

  /** Oracle: the E2 replica's verified pairs re-labeled by source —
    * the candidate generation stays bit-checked; only the tail select
    * changes.
    */
  lazy val crossCorpusDedupSql: String = SqlPatch(minhashPairsSql,
    """SELECT doc_a, doc_b, jaccard FROM scored
      |WHERE jaccard >= 0.7
      |ORDER BY doc_a, doc_b""".stripMargin,
    """SELECT
      |  CASE WHEN da.source IN ('src0','src1','src2','src3','src4')
      |       THEN s.doc_b ELSE s.doc_a END AS doc_id,
      |  CASE WHEN da.source IN ('src0','src1','src2','src3','src4')
      |       THEN db.source ELSE da.source END AS source,
      |  CASE WHEN da.source IN ('src0','src1','src2','src3','src4')
      |       THEN s.doc_a ELSE s.doc_b END AS ref_doc,
      |  s.jaccard
      |FROM scored s
      |JOIN documents da ON da.doc_id = s.doc_a
      |JOIN documents db ON db.doc_id = s.doc_b
      |WHERE s.jaccard >= 0.7
      |  AND ((da.source IN ('src0','src1','src2','src3','src4'))
      |       <> (db.source IN ('src0','src1','src2','src3','src4')))
      |ORDER BY doc_id, ref_doc""".stripMargin)

  // ---- E54: boilerplate n-gram lexicon -------------------------------

  /** E54 — boilerplate lexicon mining: the top repeated passages across
    * documents, with their document and SOURCE spread (a passage
    * repeating across many sources is navigation/licence boilerplate;
    * within one source it may be legitimate style) — the lexicon E20's
    * removal pass would consume as a blocklist, mined the way Lee et
    * al.'s most-duplicated-span tables are built.
    *
    * Scale shape: the E20 window cut in the scan, then the group key
    * is the md5 HASH (a 10-word string key would shuffle ~10× the
    * bytes); the display text rides as a min() aggregate. The top-10
    * cut is orderBy+limit = TakeOrderedAndProject — bounded heap over
    * the passage vocabulary, no global sort.
    */
  def boilerplateNgrams(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val P = passageWords
    val ws = split(col("text"), " ")
    val passages = transform(
      sequence(lit(0), floor((size(ws) - 1) / P).cast("int")),
      i => array_join(slice(ws, i * P + lit(1), lit(P)), " "))
    Tables.atComputeParallelism(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), explode(passages).as("para"))
      .select(col("doc_id"), col("source"), md5(col("para")).as("h"), col("para"))
      .groupBy(col("h"))
      .agg(min(col("para")).as("passage"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .select(col("passage"), col("n_docs"), col("n_sources"), col("n_occ"))
      .orderBy(col("n_docs").desc, col("passage"))
      .limit(k)
  }

  val boilerplateNgramsSql: String =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |paras AS (
      |  SELECT doc_id, source,
      |    array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS para
      |  FROM w, unnest(range(0, CAST(floor((len(ws) - 1) / 10) AS BIGINT) + 1)) AS t(i)),
      |g AS (
      |  SELECT md5(para) AS h, min(para) AS passage,
      |    count(DISTINCT doc_id) AS n_docs,
      |    count(DISTINCT source) AS n_sources,
      |    count(*) AS n_occ
      |  FROM paras GROUP BY 1)
      |SELECT passage, n_docs, n_sources, n_occ
      |FROM g WHERE n_docs >= 2
      |ORDER BY n_docs DESC, passage
      |LIMIT 10""".stripMargin

  // ---- E51: near-dup threshold sweep ---------------------------------

  /** E51 — dedup threshold sweep: duplication volume as a function of
    * the Jaccard cut (the curve a pipeline owner reads before PICKING
    * τ — too low merges topical articles, too high misses mirrors).
    * Pairs are mined ONCE at the 0.5 floor over E2's LSH candidate set
    * (banding recall at the low τ end is the 16×4 scheme's — identical
    * in both engines by construction, since the oracle replicates the
    * banding bit-for-bit); the sweep itself is conditional aggregates:
    * per-τ pair counts in one pass over the pair list, per-τ dup-doc
    * counts from each doc's BEST pair similarity (one unpivoted max
    * aggregate) — no re-mining per τ.
    */
  val sweepTaus: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  def dedupThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: BOTH sweep aggregates (pair counts, per-doc best)
    // consume the mined pair list; without the cut each one re-runs the
    // whole LSH mine — two full corpus passes instead of one, and the
    // pair list is dup-rate-bounded (tiny next to the corpus)
    val pairs = minhashPairs(spark, dir, threshold = 0.5).localCheckpoint()
    val pairCounts = pairs.agg(
      sum(when(col("jaccard") >= sweepTaus.head, 1L).otherwise(0L)).as(s"p_0"),
      sweepTaus.tail.zipWithIndex.map { case (t, i) =>
        sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"p_${i + 1}") }: _*)
    val docBest = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("d"), col("jaccard"))
      .groupBy(col("d")).agg(max(col("jaccard")).as("jmax"))
    val docCounts = docBest.agg(
      sum(when(col("jmax") >= sweepTaus.head, 1L).otherwise(0L)).as(s"d_0"),
      sweepTaus.tail.zipWithIndex.map { case (t, i) =>
        sum(when(col("jmax") >= t, 1L).otherwise(0L)).as(s"d_${i + 1}") }: _*)
    val stackArgs = sweepTaus.zipWithIndex.flatMap { case (t, i) =>
      Seq(lit(f"$t%.1f"), coalesce(col(s"p_$i"), lit(0L)), coalesce(col(s"d_$i"), lit(0L)))
    }
    pairCounts.crossJoin(docCounts)
      .select(stack((lit(sweepTaus.size) +: stackArgs): _*)
        .as(Seq("tau", "n_pairs", "n_dup_docs")))
      .orderBy(col("tau"))
  }

  lazy val dedupThresholdSweepSql: String = {
    val arms = sweepTaus.map { t =>
      val l = f"$t%.1f"
      s"""SELECT '$l' AS tau,
         |  (SELECT CAST(coalesce(sum(CASE WHEN jaccard >= $l THEN 1 ELSE 0 END), 0) AS BIGINT) FROM scored) AS n_pairs,
         |  (SELECT CAST(coalesce(sum(CASE WHEN jmax >= $l THEN 1 ELSE 0 END), 0) AS BIGINT) FROM docbest) AS n_dup_docs""".stripMargin
    }.mkString("\nUNION ALL\n")
    SqlPatch(minhashPairsSql,
      """SELECT doc_a, doc_b, jaccard FROM scored
        |WHERE jaccard >= 0.7
        |ORDER BY doc_a, doc_b""".stripMargin,
      s""", docbest AS (
         |  SELECT d, max(jaccard) AS jmax FROM (
         |    SELECT doc_a AS d, jaccard FROM scored WHERE jaccard >= 0.5
         |    UNION ALL
         |    SELECT doc_b AS d, jaccard FROM scored WHERE jaccard >= 0.5)
         |  GROUP BY d)
         |$arms
         |ORDER BY tau""".stripMargin)
  }

  // ---- E47: leakage-free train/val split -----------------------------

  /** E47 — leakage-free train/validation split: the split draw happens
    * on the dup-CLUSTER label, not the document, so a near-duplicate
    * pair can never straddle train and val (the eval-leakage mode that
    * inflates held-out scores; cf. the dedup motivation in Lee et al.
    * 2022). Reads the MEMOIZED E5b mapping like an index; the draw is
    * the house 16-bit md5 bucket on the cluster label — deterministic,
    * coordination-free, identical in both engines. ~20% of CLUSTERS
    * (not docs) land in val.
    */
  def leakFreeSplit(spark: SparkSession, dir: String,
                    valOf65536: Int = 13107): DataFrame =
    canonicalMapping(spark, dir)
      .withColumn("u16", expr(Curation.bucket16ExprOf("CAST(keep_id AS STRING)")))
      .select(col("doc_id"), col("keep_id"),
        when(col("u16") < valOf65536, "val").otherwise("train").as("split"))
      .orderBy(col("doc_id"))

  lazy val leakFreeSplitSql: String = {
    val u16 = SqlPatch(Curation.bucket16ExprOf("CAST(keep_id AS VARCHAR)"),
      "instr", "strpos")
    SqlPatch(canonicalCorpusSql,
      "\nSELECT s AS doc_id, min(d) AS keep_id FROM reach GROUP BY s ORDER BY doc_id",
      s""",
         |canon AS (SELECT s AS doc_id, min(d) AS keep_id FROM reach GROUP BY s)
         |SELECT doc_id, keep_id,
         |  CASE WHEN $u16 < 13107 THEN 'val' ELSE 'train' END AS split
         |FROM canon
         |ORDER BY doc_id""".stripMargin)
  }

  // ---- E45: Bloom-filter membership dedup (BFF) ----------------------

  /** E45 — Bloom-filter paragraph dedup (the Dolma "BFF" design: build
    * a Bloom filter over the reference corpus's paragraph hashes, then
    * flag incoming documents whose paragraphs mostly hit it). The
    * filter is the memory-bounded alternative to E20's exact count
    * join: at 100 TB the paragraph table is corpus-sized, but the
    * filter is a FIXED 2^18-bit array — the structure streams, never
    * joins.
    *
    * Spark-first, zero driver loops over data: the paragraph hash is
    * the house FNV/fmix64 10-gram kernel (plans/Sketches.NgramHashes —
    * hashed straight off the token array, no window strings built);
    * the k bit positions are Kirsch–Mitzenmacher double hashing
    * (h1 + i·h2 mod m) with h1/h2 taken from DISJOINT BIT SLICES of
    * the one well-mixed 64-bit hash (bits 0-17 and 18-35 — pure
    * shift/mask column arithmetic, ANSI-safe, and 36 ≤ 64 bits so no
    * second hash pass is needed); the build is one `bit_or` aggregate
    * per 64-bit word (mergeable — map-side partials OR together —
    * exactly the mergeability a Bloom filter's union property
    * guarantees); the probe embeds the word array as ONE literal and
    * tests k bits with shift/mask arithmetic in the scan projection.
    * The driver materializes only the ≤ m/64-row word table — the
    * filter itself, which is broadcast-sized by definition.
    *
    * ★ (r12): the hash family is the repo's DuckDB-replicated device
    * (tok_hash/mul64/fmix64 macros), so the WHOLE structure — window
    * hashes, bit positions, membership, the per-doc hit ratio — is
    * oracle-checked exactly; BloomSpec still pins the no-false-
    * negative contract and the FP-rate bound.
    */
  val bloomBitsLog2 = 18
  val bloomK = 4
  val bloomParaWords = 10

  private def bloomPositions(h: Column): Column = {
    val m = 1L << bloomBitsLog2
    val h1 = h.bitwiseAND(lit(m - 1))
    // odd step so (h1 + i*h2) walks all of the power-of-two table;
    // bits 18-35 of the same mixed hash — independent of bits 0-17
    val h2 = shiftrightunsigned(h, bloomBitsLog2)
      .bitwiseAND(lit(m - 1)).bitwiseOR(lit(1L))
    transform(sequence(lit(0), lit(bloomK - 1)),
      i => pmod(h1 + i * h2, lit(m)))
  }

  def bloomDedup(spark: SparkSession, dir: String,
                 flagRatio: Double = 0.8): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.plans.Sketches.ngramHashes(
          split(col("text"), " "), bloomParaWords, distinct = false).as("phs"))
    val refBits = docs
      .filter(col("source").isin(refSources.map(x => x: Any): _*))
      .select(explode(col("phs")).as("h"))
      .select(explode(bloomPositions(col("h"))).as("pos"))
      .groupBy((col("pos") / 64).cast("long").as("word"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").as("mask"))
    // the filter IS a broadcast-sized object: materialize the word
    // table (≤ m/64 rows) and embed it as one literal array
    val words = new Array[Long](1 << (bloomBitsLog2 - 6))
    refBits.collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val wordsLit = lit(words)
    val hitExpr = (h: Column) =>
      forall(bloomPositions(h), pos =>
        element_at(wordsLit, (pos / 64).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast("int"))) =!= 0L)
    docs.filter(!col("source").isin(refSources.map(x => x: Any): _*))
      .select(col("doc_id"), col("source"),
        size(col("phs")).cast("long").as("n_paras"),
        size(filter(col("phs"), h => hitExpr(h))).cast("long").as("n_hits"))
      .withColumn("flagged", col("n_hits") >= col("n_paras") * flagRatio)
      .orderBy(col("doc_id"))
  }

  /** Exact replica of the E45 structure: same 10-gram FNV/fmix64
    * window hashes (the minhashPairsSql device at n=10, via
    * list_reduce instead of nested CASE), same bit-slice double
    * hashing, and Bloom membership expressed as what the bit array IS
    * — the SET of positions the reference corpus set (a distinct
    * position table + join), so build and probe are bit-for-bit the
    * operator's arithmetic.
    */
  val bloomDedupSql: String = sketchOracleMacros +
    """CREATE OR REPLACE TEMP TABLE bf_thl AS
      |SELECT doc_id, source, list(th ORDER BY pos) AS thl, count(*) AS len
      |FROM (SELECT doc_id, source, pos, tok_hash(tok) AS th
      |      FROM (SELECT doc_id, source, generate_subscripts(toks, 1) AS pos,
      |                   unnest(toks) AS tok
      |            FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
      |                  FROM documents)))
      |GROUP BY doc_id, source;
      |CREATE OR REPLACE TEMP TABLE bf_wh AS
      |SELECT doc_id, source,
      |  fmix64(list_reduce(
      |    list_prepend(11400714819323198485::HUGEINT,
      |      thl[CAST(w AS INT):CAST(least(w + 9, len) AS INT)]),
      |    (acc, t) -> xor(mul64(acc, 1099511628211::HUGEINT), t))) AS h
      |FROM bf_thl, unnest(range(1, greatest(len - 9, 1) + 1)) AS u(w);
      |CREATE OR REPLACE TEMP TABLE bf_ph AS
      |SELECT doc_id, source, (h % 262144) AS h1,
      |  ((h // 262144) % 262144) - (((h // 262144) % 262144) % 2) + 1 AS h2
      |FROM bf_wh;
      |CREATE OR REPLACE TEMP TABLE bf_ref AS
      |SELECT DISTINCT (h1 + i * h2) % 262144 AS p
      |FROM bf_ph, unnest(range(0, 4)) AS v(i)
      |WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4');
      |CREATE OR REPLACE TEMP TABLE bf_pw AS
      |SELECT doc_id, source, wid, (h1 + i * h2) % 262144 AS p
      |FROM (SELECT doc_id, source, h1, h2, row_number() OVER () AS wid
      |      FROM bf_ph
      |      WHERE source NOT IN ('src0', 'src1', 'src2', 'src3', 'src4')) w0,
      |  unnest(range(0, 4)) AS v(i);
      |CREATE OR REPLACE TEMP TABLE bf_hits AS
      |SELECT w.doc_id, w.source, w.wid, count(r.p) AS n_in
      |FROM bf_pw w LEFT JOIN bf_ref r ON w.p = r.p
      |GROUP BY 1, 2, 3;
      |SELECT doc_id, source,
      |  CAST(count(*) AS BIGINT) AS n_paras,
      |  CAST(coalesce(sum(CASE WHEN n_in = 4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
      |  coalesce(sum(CASE WHEN n_in = 4 THEN 1 ELSE 0 END), 0) >= count(*) * 0.8 AS flagged
      |FROM bf_hits
      |GROUP BY doc_id, source
      |ORDER BY doc_id""".stripMargin

  // ---- E57: instruction-pair dedup -----------------------------------

  /** E57 — instruction-data dedup: SFT corpora are (prompt, response)
    * pairs, and the dedup key is the PROMPT — near-identical prompts
    * with different responses teach contradiction, so pipelines keep
    * exactly one pair per normalized prompt, electing the best
    * response (E1 keys the whole text, E43 elects within near-dup
    * clusters; this row is the prompt-keyed exact form every
    * instruction pipeline runs first). Prompt = leading words
    * (stand-in for the schema'd prompt field), normalized by
    * lowercasing; keep rule = longest response, doc_id tiebreak.
    * One groupBy on the prompt hash (md5 — shuffles 16 bytes, not the
    * prompt text), one rank window inside the hash key.
    */
  def instructionDedup(spark: SparkSession, dir: String,
                       promptWords: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(lower(concat_ws(" ",
          slice(split(col("text"), " "), 1, promptWords)))).as("prompt_key"),
        (length(col("text"))).as("resp_len"))
    val w = Window.partitionBy(col("prompt_key"))
      .orderBy(col("resp_len").desc, col("doc_id"))
    pairs
      .withColumn("rk", row_number().over(w))
      .groupBy(col("prompt_key"))
      .agg(count(lit(1)).as("n_members"),
        min(when(col("rk") === 1, col("doc_id"))).as("keep_doc"),
        sum(when(col("rk") > 1, col("resp_len")).otherwise(0L)).cast("long")
          .as("dropped_chars"))
      .filter(col("n_members") > 1)
      .orderBy(col("prompt_key"))
  }

  val instructionDedupSql: String =
    """WITH pairs AS (
      |  SELECT doc_id,
      |    md5(lower(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))) AS prompt_key,
      |    length(text) AS resp_len
      |  FROM documents),
      |r AS (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY prompt_key ORDER BY resp_len DESC, doc_id) AS rk
      |  FROM pairs)
      |SELECT prompt_key, count(*) AS n_members,
      |  min(CASE WHEN rk = 1 THEN doc_id END) AS keep_doc,
      |  CAST(sum(CASE WHEN rk > 1 THEN resp_len ELSE 0 END) AS BIGINT) AS dropped_chars
      |FROM r
      |GROUP BY prompt_key
      |HAVING count(*) > 1
      |ORDER BY prompt_key""".stripMargin
}

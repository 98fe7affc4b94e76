package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling / MinHash / SimHash batteries (SURVEY §2 E2/E3).
  *
  * Everything here is composed from codegen'd builtins (split /
  * transform / aggregate / zip_with / xxhash64) — no UDFs — so the whole
  * signature computation stays inside one whole-stage-codegen span and
  * scales linearly with document bytes. Shingle strings are hashed ONCE
  * (xxhash64) and the k MinHash "permutations" re-mix the 8-byte hash
  * (xxhash64(h, seed)), not the string — at 100 TB that's the difference
  * between O(k·bytes) and O(k + bytes) per document.
  */
object HashFns {

  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as strings (for exact Jaccard / display). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " "))
  }

  /** Shingles pre-hashed to 64-bit — the working representation.
    * Native kernel (graft.plans.NgramHashes): tokens are hashed once and
    * windows combine token hashes — no shingle strings are ever built.
    * Positional (one hash per window, in order) — winnowing-safe.
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.plans.Sketches.ngramHashes(tokens(text), n, distinct = false)

  /** Deduplicated (sorted) shingle-hash set — the representation for
    * set-Jaccard and MinHash inputs; smaller arrays through shuffles.
    */
  def shingleHashSet(text: Column, n: Int): Column =
    graft.plans.Sketches.ngramHashes(tokens(text), n, distinct = true)

  /** Per-token 64-bit hashes (n=1 n-grams) — SimHash input. */
  def tokenHashes(text: Column): Column =
    graft.plans.Sketches.ngramHashes(tokens(text), 1, distinct = false)

  /** k-wide MinHash signature over pre-hashed shingles — native kernel
    * (graft.plans.MinHashSig): one tight loop, no per-seed intermediate
    * arrays. The higher-order-function formulation of the same math ran
    * interpreted and was ~70× slower at sf0.1.
    */
  def minhashSignature(shingleHs: Column, k: Int): Column =
    graft.plans.Sketches.minhash(shingleHs, k)

  /** LSH band keys: split the signature into `bands` bands of `rows`
    * and hash each band (+ its index, so bands don't collide across
    * positions). Exploding these gives O(docs×bands) shuffle — never
    * O(docs²).
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    graft.plans.Sketches.bandKeys(sig, bands, rows)

  /** Exact Jaccard between two pre-hashed shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a); val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") / size(array_union(da, db))
  }

  /** 64-bit SimHash over pre-hashed tokens: per bit, sum +1/-1 by the
    * bit of each token hash, then pack the signs. Native kernel
    * (graft.plans.SimHash64) for the same reason as minhashSignature.
    */
  def simhash64(tokenHs: Column): Column =
    graft.plans.Sketches.simhash(tokenHs)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** c-bit chunk keys of a 64-bit signature — pigeonhole blocking: two
    * signatures within hamming distance (64/c - 1) share ≥1 chunk.
    */
  def simhashChunks(sig: Column, chunks: Int): Column = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    transform(
      sequence(lit(0), lit(chunks - 1)),
      c => struct(
        c.as("chunk_id"),
        call_function("shiftright", sig, c * lit(width)).bitwiseAND(lit(mask)).as("chunk_val")))
  }
}

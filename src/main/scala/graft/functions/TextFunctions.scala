package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/hash primitives shared by the LLM-pipeline operators
  * (tokenize, shingles, MinHash, SimHash, fingerprints).
  *
  * Everything here is built from codegen'd built-ins or cheap higher-order
  * fns over short arrays. The per-row heavy lifting (shingle sets, MinHash
  * signatures, SimHash bit votes) lives in the native expressions of
  * graft.functions.ArrayExpressions — single tight JVM passes per row; the
  * HOF formulations kept here (shingleSetFromHashes, permute, bandHashes)
  * are the declarative reference implementations those expressions are
  * parity-tested against (ExpressionParitySpec) plus the pieces still used
  * directly (band hashes over short signature arrays).
  */
object TextFunctions {

  /** Whitespace tokenizer (the fixture corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles: set representation of a document. */
  def shingleSet(tokens: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(0), greatest(size(tokens) - n, lit(0))),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))

  /** Distinct HASHED word n-gram shingles (64-bit): the set representation
    * the dedup operators actually compute with. Hashing each n-gram instead
    * of materializing its string makes shingling ~2× cheaper and turns all
    * downstream set ops (intersect/union/sort) into primitive long ops.
    * Set sizes — and therefore Jaccard — are preserved up to 2^-64 hash
    * collisions, so results still match a string-based oracle. */
  def hashedShingleSet(tokens: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(0), greatest(size(tokens) - n, lit(0))),
        i => xxhash64((0 until n).map(j => get(tokens, i + lit(j))): _*)))

  /** Per-token 64-bit hashes. Materialize this as its OWN projection column
    * before shingling — each token is then hashed once, not once per
    * shingle position (n× redundant string hashing). */
  def tokenHashes(tokens: Column): Column = transform(tokens, t => xxhash64(t))

  /** Shingle set over pre-hashed tokens: combines n consecutive token
    * hashes (longs) per shingle — primitive-width hashing instead of
    * re-reading string payloads. Same set-size/Jaccard guarantees as
    * hashedShingleSet; values differ (both are opaque 64-bit ids). */
  def shingleSetFromHashes(th: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(0), greatest(size(th) - n, lit(0))),
        i => xxhash64((0 until n).map(j => get(th, i + lit(j))): _*)))

  /** Exact Jaccard similarity of two (distinct-element) shingle arrays.
    * Integer set sizes divided as doubles — bit-deterministic. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Lossless size-ratio prefilter for Jaccard >= tau:
    * J(A,B) >= tau implies min(|A|,|B|) >= tau * max(|A|,|B|). */
  def sizeRatioPass(na: Column, nb: Column, tau: Double): Column =
    least(na, nb).cast("double") >= lit(tau) * greatest(na, nb).cast("double")

  // ---- MinHash ----------------------------------------------------------

  /** Mersenne prime 2^31 - 1: hash universe for the MinHash permutations. */
  val MinhashPrime: Long = 2147483647L

  /** Deterministic (a, b) coefficients for k hash permutations. */
  def minhashCoeffs(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextInt((MinhashPrime - 1).toInt).toLong,
                 rnd.nextInt(MinhashPrime.toInt).toLong))
  }

  /** Base hash of a shingle into [0, P): input to every permutation. */
  def shingleHash(shingle: Column): Column =
    pmod(xxhash64(shingle), lit(MinhashPrime))

  /** One MinHash permutation applied to a base-hash column: (a*h + b) mod P.
    * a,h < 2^31 so a*h + b stays well inside Long range. */
  def permute(h: Column, a: Long, b: Long): Column =
    pmod(lit(a) * h + lit(b), lit(MinhashPrime))

  /** LSH band hashes over a MinHash signature array: bands of `r` rows,
    * each band hashed (band index mixed in so bands never collide). */
  def bandHashes(sig: Column, numBands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      j => xxhash64(j, slice(sig, j * lit(r) + lit(1), lit(r))))

  // ---- Fingerprinting ----------------------------------------------------

  /** Polynomial rolling-hash document fingerprint over token values,
    * mod 1e9+7. Token value = ascii(first char) * 31 + token length —
    * chosen because both Spark and DuckDB can compute it identically
    * (oracle parity); a production fingerprint would use xxhash64(token)
    * (see contentHash below). */
  def polyFingerprint(tokens: Column): Column = {
    val p = 1000000007L
    val vals = transform(tokens, t => ascii(t) * lit(31L) + length(t).cast("long"))
    aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      element_at(vals, 1),
      (acc, v) => pmod(acc * lit(131L) + v, lit(p)))
  }

  /** Full-content 64-bit hash — the exact-dedup key at scale. */
  def contentHash(text: Column): Column = xxhash64(text)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable text hashing primitives. Everything is
  * modular arithmetic over BIGINT so the exact same values are computable
  * in the DuckDB oracle (`list_reduce` + `unicode`) — unlike xxhash64 /
  * murmur, whose implementations differ across engines. The polynomial
  * fold is the classic rolling hash (base 31, prime modulus).
  */
object TextHash {
  val P = 1000000007L
  val Base = 31L

  /** Polynomial rolling hash of a string column:
    * fold(chars, 0, (acc, c) => (acc*31 + codepoint(c)) % P).
    * DuckDB twin: list_reduce(list_transform(string_split(s, ''),
    * c -> CAST(unicode(c) AS BIGINT)), (a,b) -> (a*31+b) % P)
    * (identical because (0*31+c1)%P == c1).
    */
  def rollingHash(c: Column): Column = HashFunctions.polyHash(c)

  /** Universal-hash family over an already-hashed value:
    * h_j(x) = (a_j * x + b_j) % P. Used for MinHash signatures.
    */
  def rehash(h: Column, a: Long, b: Long): Column = (h * a + b) % P

  /** Fixed MinHash seed pairs (a_j odd, deterministic — no RNG so runs
    * and oracle agree). 16 hashes = 4 bands x 4 rows.
    */
  val minhashSeeds: Seq[(Long, Long)] = (0 until 16).map { j =>
    (2L * j + 3L, 7919L * (j + 1))
  }

  /** Word n-gram shingles of a pre-split words array; empty array when
    * the document has fewer than n words.
    */
  def shingles(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Rolling-hashed shingles (array<bigint>): hashing each n-gram inside
    * the array transform avoids materializing / pairwise-comparing big
    * string arrays downstream — dedup on longs is a hash aggregate.
    */
  def shingleHashes(words: Column, n: Int): Column =
    HashFunctions.shingleHashes(words, n)

  /** 32-bit SimHash from an array of word hashes: bit i is set iff
    * sum over words of (bit_i(h) ? 1 : -1) > 0. Expressed with
    * higher-order functions only, so the oracle can mirror it.
    */
  def simhash32(wordHashes: Column): Column = HashFunctions.simhash32(wordHashes)
}

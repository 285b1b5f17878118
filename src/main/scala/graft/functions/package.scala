package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Shared column-level building blocks.
  *
  * Everything here composes built-in (codegen'd) Catalyst expressions —
  * no Scala UDFs — so whole-stage codegen stays intact at 100 TB.
  */
package object functions {

  /** Cosine similarity between two array<float|double> columns —
    * native codegen'd primitive loops ([[VectorExpressions]]; the HOF
    * zip_with/aggregate composition is CodegenFallback and boxes every
    * element). Elements promote to double inside the loops, which is
    * bit-identical to casting the arrays first. */
  def cosineSim(a: Column, b: Column): Column =
    VectorExpressions.arrayDot(a, b) /
      (sqrt(VectorExpressions.arrayNorm2(a)) * sqrt(VectorExpressions.arrayNorm2(b)))

  /** Dot product of two numeric array columns (double). */
  def dotProduct(a: Column, b: Column): Column = VectorExpressions.arrayDot(a, b)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Polynomial rolling-hash fingerprint of a string, mod 1e9+7.
    * Wraparound-free (fits int64) so DuckDB (which raises on BIGINT
    * overflow) can compute the identical value for the oracle. Native
    * codegen'd byte loop ([[StringExpressions.PolyHash]]) — the HOF
    * char fold was interpreted and dominated hash-per-shingle paths. */
  def polyFingerprint(text: Column): Column =
    StringExpressions.polyHash(text)

  /** Half-up 4-decimal rounding of the mean `sumCents / (100 * n)`,
    * computed in exact integer arithmetic: floor((200*s + n) / (2n)) / 1e4.
    * Engine-portable — float `round()` implementations disagree when the
    * true mean lands exactly on a x.xxxx5 boundary (Spark rounds the
    * shortest decimal repr, DuckDB rounds the raw binary double). */
  def roundMeanE4(sumCents: Column, n: Column): Column =
    floor((sumCents * 200 + n) / (n * 2)) / 10000.0

  /** Exact integral division (SQL `div`) of two long columns. Column
    * `/` casts both operands to double, so quotients drift once the
    * dividend passes 2^53 — this stays exact at any int64 magnitude.
    * Truncates toward zero: equal to floor division only for
    * non-negative operands, so callers keep sign handling explicit. */
  def divLong(a: Column, b: Column): Column =
    ColumnBridge.column(IntegralDivide(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Lower-cased, punctuation-stripped, whitespace-normalized text —
    * the canonical form used by dedup and fingerprinting. One fused
    * native pass ([[StringExpressions.NormalizeText]]), bit-identical
    * to the composed chain
    * trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9\\s]", " "),
    * "\\s+", " ")) that every DuckDB oracle replicates. */
  def normalizeText(text: Column): Column =
    StringExpressions.normalizeTextNative(text)

  /** Distinct character n-grams of a string as an array column. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(0))),
        i => text.substr(i, lit(n))))

  /** Word n-gram shingles (space-joined) of a string. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(text, "\\s+")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(words) - n, lit(-1))),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }
}

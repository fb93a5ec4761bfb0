package graft.pipeline

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Vocabulary-driven (BPE-merge) tokenizer — the pluggable alternative to
 * [[TextAnalysis.tokens]]' whitespace splitting, so token budgets
 * ([[Sampling.packByBudget]]) can approximate a real LLM context window
 * instead of word counts.
 *
 * Algorithm (the standard byte-pair-encoding inference walk, greedy one
 * pass per merge rule): each whitespace word is spaced into characters
 * ("hello" -> "h e l l o"), then every merge rule `(a, b) -> ab` is applied
 * in priority order as a global replacement of "a b" with "ab"; the token
 * count is the number of segments left. Deterministic by construction —
 * a pure composition of string functions with a FIXED rule order — and
 * expressible identically in any SQL engine (the DuckDB oracle replays the
 * same walk), which is what makes `pack_bins_bpe` hash-checkable.
 *
 * This is the single-pass-per-rule variant (each rule applied once,
 * left-to-right, in vocabulary order) rather than the repeat-until-fixpoint
 * variant; for real merge tables the two agree on the overwhelming majority
 * of words, and the single-pass walk is what keeps the whole tokenizer
 * inside built-in string expressions — map-side, no UDF, no shuffle.
 *
 * Scale notes: per-row work is O(merges × word length) string scans inside
 * a `transform` lambda — linear in data, embarrassingly parallel, no state.
 * The merge table is baked into the PLAN (a few hundred literal
 * replacements), not broadcast at runtime.
 */
object Bpe {

  /**
   * Load a merges table in the public `merges.txt` format: one rule per
   * line, two space-separated symbols, highest priority first; `#`-prefixed
   * header lines skipped. Driver-side read of a SMALL file (a merge table
   * is KBs); the result is embedded into plans as literals.
   */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.textFile(path).collect().toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2, s"malformed merge rule: '$l'")
        (parts(0), parts(1))
      }

  /**
   * A small built-in English merge table (common digraph/suffix merges,
   * ordered) — the demo vocabulary used by the SQL function
   * `bpe_token_count` and the driver query. Real pipelines load their
   * model's table with [[loadMerges]].
   */
  val DemoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("o", "u"),
    ("t", "o"), ("e", "n"), ("a", "t"), ("e", "s"), ("o", "r"),
    ("s", "t"), ("a", "r"), ("a", "l"), ("i", "t"), ("i", "s"),
    ("e", "d"), ("l", "l"), ("o", "f"), ("o", "m"), ("i", "c"),
    ("a", "s"), ("l", "e"), ("e", "l"), ("u", "s"), ("c", "h"))

  /** Spaced-character form of one word: "hello" -> "h e l l o". */
  private def spaced(w: Column): Column =
    trim(regexp_replace(w, "(.)", "$1 "))

  /** Apply every merge rule, in order, to a spaced word. */
  private def mergedWord(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(spaced(w)) { case (acc, (a, b)) =>
      call_function("replace", acc, lit(s"$a $b"), lit(a + b))
    }

  /** Segment count of a merged spaced word: spaces + 1. */
  private def segments(m: Column): Column =
    length(m) - length(call_function("replace", m, lit(" "), lit(""))) + 1

  /**
   * BPE token count of a document under `merges`: sum of per-word segment
   * counts after the merge walk. Empty/whitespace-only text counts 0.
   */
  def tokenCount(text: Column, merges: Seq[(String, String)] = DemoMerges): Column = {
    val perWord = transform(TextAnalysis.tokens(text), w => segments(mergedWord(w, merges)))
    when(length(trim(text)) === 0, lit(0))
      .otherwise(aggregate(perWord, lit(0), (acc, x) => acc + x))
  }

  /**
   * The same merge walk as DuckDB SQL, for oracle construction: an
   * expression over column `c` computing the document's BPE token count.
   * Kept adjacent to the Spark spelling so the two walks cannot drift.
   */
  def duckdbTokenCountSql(c: String, merges: Seq[(String, String)] = DemoMerges): String = {
    val spacedW = """trim(regexp_replace(w, '(.)', '\1 ', 'g'))"""
    val mergedW = merges.foldLeft(spacedW) { case (acc, (a, b)) =>
      s"replace($acc, '$a $b', '$a$b')"
    }
    val segs = s"(length($mergedW) - length(replace($mergedW, ' ', ''))) + 1"
    s"""CASE WHEN length(trim($c)) = 0 THEN 0 ELSE
       | list_sum(list_transform(regexp_split_to_array(trim($c), '\\s+'),
       |   w -> $segs)) END""".stripMargin.replace("\n", " ")
  }
}

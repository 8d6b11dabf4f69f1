package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule learning over a word-frequency table —
  * the tokenizer-training step of a corpus pipeline (reference keeps no
  * tokenizer; this is the scale-path counterpart of the BPE-ish
  * pre-tokenizer in [[TextOps.tokenizeBpe]]).
  *
  * Representation: a word is a string of paren-wrapped symbols —
  * `key` → `(k)(e)(y)`, and applying merge (e,y) literally replaces
  * `(e)(y)` with `(ey)`. Because every symbol is individually bracketed
  * and the alphabet contains no parens, a pattern can neither match
  * across symbol boundaries nor share a delimiter with the next match —
  * so the engine's plain left-to-right non-overlapping `replace` IS
  * classic greedy BPE pairing (`(a)(a)(a)(a)` + merge (a,a) →
  * `(aa)(aa)`), identically in any engine with literal replace.
  *
  * Scale shape: the corpus is touched ONCE (the word-count groupBy the
  * caller provides); each merge step then runs over the word table —
  * vocabulary-sized, orders of magnitude smaller than the corpus — as
  * one explode+groupBy pair count plus a narrow literal replace. The
  * only driver-side data is ONE reduced row per step (the argmax merge
  * rule — a scalar, same gate as a KMeans centroid pull), never rows.
  */
object Bpe {

  /** `word` → `(c1)(c2)…(cn)`. */
  def symbolize(word: Column): Column =
    array_join(transform(sequence(lit(1), length(word)),
      i => concat(lit("("), word.substr(i, lit(1)), lit(")"))), "")

  /** Extracts the symbol array back out of the wrapped string. */
  val SymbolPattern = "\\(([^()]+)\\)"

  /** The shared merge loop behind [[learnMerges]] and [[encodeWords]]:
    * runs `steps` greedy merges over the symbolized word table and
    * returns (final word table `(wordCol, cnt, s)` — CACHED, caller
    * releases it — plus the learned rules in order).
    */
  private def mergeLoop(words: DataFrame, wordCol: String, cntCol: String,
                        steps: Int): (DataFrame, Seq[(Int, String, String, Long)]) = {
    // The '(symbol)' wrapping reserves parentheses as delimiters: a word
    // containing '(' or ')' would make SymbolPattern mis-parse silently
    // (paren symbols dropped from pair counts, replace firing across
    // wrong boundaries). Such words are excluded up front — enforced,
    // not just documented; real tokenizers likewise pre-split away
    // punctuation before BPE.
    var w = words
      .filter(!col(wordCol).contains("(") && !col(wordCol).contains(")"))
      .select(col(wordCol), col(cntCol).cast("long").as("cnt"),
        symbolize(col(wordCol)).as("s")).cache()
    val rules = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (step <- 1 to steps if !exhausted) {
      val pairs = w
        .select(col("cnt"),
          regexp_extract_all(col("s"), lit(SymbolPattern), lit(1)).as("a"))
        .select(col("cnt"), explode(graft.engine.functions.let(col("a")) { a =>
          when(size(a) >= 2, transform(sequence(lit(1), size(a) - 1),
            i => struct(element_at(a, i).as("lhs"), element_at(a, i + 1).as("rhs"))))
            .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))
        }).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("cnt").as("c"))
      val top = pairs.orderBy(col("c").desc, col("lhs"), col("rhs")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        rules += ((step, l, r, c))
        val prev = w
        w = prev.select(col(wordCol), col("cnt"),
          replace(col("s"), lit(s"($l)($r)"), lit(s"($l$r)")).as("s")).cache()
        w.count()
        prev.unpersist()
      }
    }
    (w, rules.result())
  }

  /** Learn `steps` merge rules from `words(wordCol, cntCol)` (distinct
    * words with occurrence counts). Returns (step, lhs, rhs,
    * pair_count): at each step the globally most frequent adjacent
    * symbol pair — occurrence-weighted, ties broken (lhs, rhs)
    * lexicographic — is recorded and merged everywhere. Stops early if
    * no pairs remain (all words single-symbol).
    */
  def learnMerges(words: DataFrame, wordCol: String, cntCol: String,
                  steps: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val (w, rules) = mergeLoop(words, wordCol, cntCol, steps)
    w.unpersist()
    rules.toDF("step", "lhs", "rhs", "pair_count")
  }

  /** Tokenizer APPLICATION: the vocabulary after `steps` learned merges
    * — each word with its occurrence count and its greedy-BPE token
    * string `(tok1)(tok2)…` plus the token count. This is the encode
    * step a pipeline ships alongside the learned rules: corpus text
    * encodes by word lookup into this vocabulary-sized table (a
    * broadcast or gram-keyed join), never by re-running merges per
    * document. Returned frame keeps the loop's final cache (resident
    * callers release via GraftSession.withQueryCaches).
    */
  def encodeWords(words: DataFrame, wordCol: String, cntCol: String,
                  steps: Int): DataFrame =
    mergeLoop(words, wordCol, cntCol, steps)._1
      .select(col(wordCol), col("cnt"),
        col("s").as("encoded"),
        size(regexp_extract_all(col("s"), lit(SymbolPattern), lit(1)))
          .cast("int").as("n_bpe_tokens"))
}

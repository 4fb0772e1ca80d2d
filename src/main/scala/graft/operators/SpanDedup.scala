package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring (span-level) deduplication: find token spans that occur
  * verbatim more than once across the corpus and REMOVE every occurrence
  * except the first, keeping each document's unique prose intact — the
  * "dedup the substring, not the document" pass of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better"), which
  * their suffix-array ExactSubstr tool implements single-node. Repeated
  * license headers, quoted tweets, syndicated paragraphs survive document-
  * level near-dup (the containing docs ARE different) and sentence-level
  * boilerplate removal (the span need not align to sentences); this
  * catches them at token granularity.
  *
  * Distributed design (no suffix array — that is a single-address-space
  * structure): a span occurs >= 2 times iff every length-`n` token window
  * inside it occurs >= 2 times, so duplicated REGIONS are exactly the
  * unions of duplicated n-gram windows. Each doc emits one xxhash64 per
  * token window (shingle longs, no strings); a window hash with >= 2
  * occurrences corpus-wide is "repeated"; its globally-first occurrence
  * (min (id, pos)) is canonical and keeps its tokens, every other
  * occurrence marks its n covered token positions for deletion; a doc-
  * local anti-join + ordered reassembly rebuilds the text. A region
  * repeated with length L >= n yields L-n+1 repeated windows whose
  * non-canonical covered-position union is the whole region — removal is
  * maximal, not window-quantized. Windows straddling a repeated-region
  * boundary mix unique context and hash unique, so they never mark
  * adjacent unique tokens: globally-unique text is NEVER removed.
  * Canonical protection is per-window, so when two repeated regions
  * OVERLAP and their first occurrences live at different sites, the
  * canonical copy of one can be partially eroded by the other's marking
  * (the same ambiguity ExactSubstr resolves arbitrarily when duplicate
  * clusters overlap); disjoint repeated regions — the overwhelmingly
  * common case — keep their first occurrence byte-intact.
  *
  * Shape at 100 TB: one tokenize+window scan (map-only, multi-arg
  * xxhash64 of the window's tokens — codegen'd, no arrays built); ONE
  * hash-key shuffle for the occurrence count/canonical pick (map-side
  * partial min/count first); marked positions explode only REPEATED
  * windows (bounded by the duplicated volume, n× before the per-doc
  * distinct); reassembly is a doc-key shuffle bounded by document size.
  * The driver never sees a row. Skew: a window repeated 10⁹ times (empty
  * string, "0 0 0 0") is ONE aggregate row producing its occurrence list
  * lazily — occurrences live in the exploded scan rows, the aggregate
  * only carries (count, canonical), so hot window hashes cost one
  * combine-tree, never a quadratic join.
  *
  * Whitespace is canonicalized: documents are reassembled from tokens
  * with single spaces and lowercased, the same normalization contract as
  * [[Dedup.stripBoilerplate]].
  *
  * @param n window length in tokens — the minimum span length considered
  *   duplicated (ExactSubstr used 50 BPE tokens; smaller n = stricter).
  * @return (idCol, clean_text, kept_tokens, removed_tokens) — one row per
  *   input document, including docs with no text or fully-removed text.
  */
object SpanDedup {

  def dedupSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n >= 2, s"window length n=$n must be >= 2")
    // (id, pos, token): the reassembly substrate. Token arrays are built
    // once per row; empty/null docs vanish here and are restored by the
    // final left join.
    val toks = df
      .select(col(idCol).as("_id"), TextFunctions.tokens(col(textCol)).as("_t"))
      .where(size(col("_t")) > 0 && col("_t") =!= array(lit("")))
      .select(col("_id"), posexplode(col("_t")).as(Seq("_p", "_tok")))

    // one window hash per starting position: h = xxhash64(tok[p..p+n)).
    // Built from the token ARRAY row (not the exploded table) so the
    // window is a map-side slice, never a self-join.
    val wins = df
      .select(col(idCol).as("_id"), TextFunctions.tokens(col(textCol)).as("_t"))
      .where(size(col("_t")) >= n)
      .select(col("_id"), posexplode(
        transform(sequence(lit(0), size(col("_t")) - n),
          // tokens are whitespace-split, so a space separator cannot
          // alias across token boundaries ("ab c" vs "a bc")
          i => xxhash64(concat_ws(" ", slice(col("_t"), i + 1, lit(n))))))
        .as(Seq("_p", "_h")))

    // per window hash: occurrence count and the canonical (first) site.
    // min_by on struct(_id, _p) = global first occurrence; both aggregates
    // partial-combine map-side, so the shuffle carries one row per
    // DISTINCT window hash regardless of how hot it is.
    val repeated = wins.groupBy("_h")
      .agg(count(lit(1)).as("_c"),
        min(struct(col("_id"), col("_p"))).as("_first"))
      .where(col("_c") >= 2)
      .select(col("_h"), col("_first._id").as("_cid"), col("_first._p").as("_cp"))

    // non-canonical occurrences of repeated windows mark their n covered
    // token positions; distinct bounds the explode by doc length.
    val marked = wins.join(repeated, Seq("_h"))
      .where(!(col("_id") === col("_cid") && col("_p") === col("_cp")))
      .select(col("_id"),
        explode(sequence(col("_p"), col("_p") + n - 1)).as("_p"))
      .distinct()

    val rebuilt = toks.join(marked, Seq("_id", "_p"), "left_anti")
      .groupBy("_id")
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("_p"), col("_tok")))),
          x => x.getField("_tok"))).as("clean_text"),
        count(lit(1)).as("kept_tokens"))

    val counts = toks.groupBy("_id").agg(count(lit(1)).as("_total"))
    df.select(col(idCol))
      .join(counts.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .join(rebuilt.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (coalesce(col("_total"), lit(0L)) -
          coalesce(col("kept_tokens"), lit(0L))).as("removed_tokens"))
  }
}

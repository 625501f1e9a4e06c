package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search over a document corpus: Okapi BM25 ranking plus the
  * inverted term-statistics pass it is built on. The retrieval side of a
  * training-data pipeline — "find the documents about X" over 100 TB
  * without an external search cluster.
  *
  * Every score is assembled from integer corpus statistics (term
  * frequencies, document frequencies, document lengths) with ONE float
  * expression at the end, so a SQL oracle reproduces it exactly; the
  * final score is rounded to 4 decimals like the rest of graft.pipeline.
  */
object Search {
  private def words(text: Column): Column = split(lower(trim(text)), " ")

  /** Per-(document, term) term frequencies for the query terms only —
    * the probe-side slice of an inverted index. One explode + one
    * hash-aggregate on (id, term); the filter happens BEFORE the
    * aggregate, so shuffle volume is ∝ query-term occurrences, not
    * corpus tokens. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame =
    df.select(col(idCol), explode(words(col(textCol))).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col(idCol), col("__t").as("term"))
      .agg(count(lit(1)).as("tf"))

  /** Okapi BM25 scores for a fixed bag of query terms: for every document
    * matching at least one term,
    * score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative
    * "plus-one" idf variant (Lucene's choice), so rare AND common terms
    * both contribute positively. Output: (id, score) — every matching
    * document with its rounded score; callers page with orderBy/limit.
    *
    * Scale shape: the corpus is scanned once for (dl) and once for the
    * query-term explode (both prune to id+text); document frequencies
    * aggregate from the per-(doc,term) tf frame (tiny: ≤ |terms| rows)
    * and come back as a BROADCAST join; the corpus-level (N, avgdl)
    * scalar pair rides the same broadcast. The only wide exchanges are
    * the two hash-aggregates on (id, term) and (id) — both ∝ matching
    * documents, never ∝ corpus tokens. */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val lens = df.select(col(idCol), size(words(col(textCol))).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = termFrequencies(df, idCol, textCol, terms)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    tf.join(lens, idCol)
      .join(broadcast(dfreq.crossJoin(stats)), "term")
      .withColumn("__s",
        idf * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 4).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of scored retrieval
    * lists — the standard hybrid-search combiner (e.g. BM25 keyword hits
    * fused with embedding-kNN hits, or several query reformulations):
    * each list is ranked internally (score desc, id asc — deterministic),
    * and fused(d) = Σ_lists 1/(k0 + rank_list(d)); documents absent from
    * a list contribute nothing there. k0 = 60 is the paper's constant.
    * Output: (id, rrf rounded to 6, n_lists = how many lists hit).
    *
    * Scale note: inputs are query RESULT lists (top-N bounded), not
    * corpora, so the per-list global ranking window is a bounded
    * single-partition sort — same class as the paging operators. The
    * fusion itself is one hash-aggregate on the id. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String,
              k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    lists.map { l =>
      l.select(col(idCol), col(scoreCol))
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col(scoreCol).desc, col(idCol).asc)))
        .select(col(idCol), (lit(1.0) / (col("__r") + lit(k0))).as("__c"))
    }.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(round(sum(col("__c")), 6).as("rrf"), count(lit(1)).as("n_lists"))
  }
}

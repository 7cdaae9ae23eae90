package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{CacheScope, Relational}

/** Sparse lexical retrieval — BM25 top-k and reciprocal-rank fusion — the
  * inverted-index tier that sits next to the dense tiers
  * ([[graft.similarity.Similarity]] knnBrute / annIvf / knnTruncatedRerank
  * and the q160 chunk→embed→rank RAG composite). Production retrieval for
  * training-data work (decontamination lookups, eval-set leakage probes,
  * RAG corpora) is hybrid: a lexical ranker catches exact-term evidence
  * that embedding similarity smooths away, and the two rankings fuse by
  * reciprocal rank, so both tiers need to exist in the engine.
  *
  * BM25 is the Robertson–Spärck Jones formulation with the +1-inside-ln
  * IDF (the Lucene default, non-negative for every df):
  *
  *   score(q,d) = Σ_{t∈q}  ln(1 + (N − df + ½)/(df + ½))
  *                        · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Shapes chosen for the 100 TB corpus:
  *
  *  - The corpus is touched exactly twice, both passes map-side
  *    combinable: one exploding aggregate builds the (doc, dl, token, tf)
  *    postings index, one slim aggregate the (N, avgdl) stats row. The
  *    index is the persistable artifact — [[bm25Index]] scope-persists it
  *    and [[bm25TopKFromIndex]] is the query-session shape that never
  *    re-reads text (the `FromSigs`/`FromHashes` discipline).
  *  - Scoring prunes the index to query terms FIRST (broadcast semi
  *    shape): the corpus-sized postings frame is filtered map-side and
  *    never reshuffles; df for the pruned terms is still the global df.
  *  - BM25 term weights are query-independent, so they are computed once
  *    per surviving (doc, token) row and fanned out to queries by a
  *    broadcast (token → qid) join — a 1000-query batch costs one extra
  *    broadcast join, not 1000 corpus passes.
  *  - Per-term weights micro-quantize to integer millionths BEFORE the
  *    per-(qid, doc) sum, so scores are exact longs: summation-order-free
  *    and engine-portable (the tCloseness/voteReliability integer
  *    discipline). The only float step is the per-term weight itself,
  *    which both engines evaluate with an identical expression tree.
  */
object Retrieval {

  /** Persistable BM25 index: `postings` = (doc, dl, token, tf) — one row
    * per distinct (doc, token), dl riding along (functionally dependent
    * on doc, so grouping by it adds no cardinality); `stats` = one row
    * (n_docs, sum_dl, avgdl) — sum_dl is the exact long the merge
    * algebra needs; avgdl derives from it. Both frames parquet-able for
    * index-once/query-many sessions. */
  final case class Bm25Index(postings: DataFrame, stats: DataFrame)

  /** Build the BM25 index in one exploding pass + one slim stats pass.
    *
    * N and avgdl count the INPUT frame, not the postings: token-empty
    * docs belong in N and in avgdl's denominator even though they can
    * never match (the `TfIdf.tfidf` N-derivation lesson). */
  def bm25Index(corpus: DataFrame, idCol: Column, toksCol: Column,
                scope: CacheScope = CacheScope.unmanaged): Bm25Index = {
    val base = corpus.select(idCol.as("doc"), toksCol.as("tk"))
    val postings = scope.persist(
      base.select(col("doc"), size(col("tk")).cast("long").as("dl"),
          explode(col("tk")).as("token"))
        .groupBy("doc", "dl", "token").agg(count(lit(1)).as("tf")))
    val stats = base.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("tk")).cast("long")), lit(0L)).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    Bm25Index(postings, stats)
  }

  /** Fold a delta index into a base index — the incremental-ingestion
    * shape: index each arriving batch alone (one pass over the batch),
    * merge in O(1). Postings union row-for-row (doc sets must be
    * disjoint — re-ingesting an existing doc id is the caller's CDC
    * problem, see `Relational.applyCdc`); stats recombine EXACTLY from
    * the long-typed (n_docs, sum_dl), so a merged index scores
    * bit-identically to one built over the union corpus (pinned in
    * RetrievalSpec). No df bookkeeping exists to merge: df derives from
    * postings at query time. */
  def bm25IndexMerge(a: Bm25Index, b: Bm25Index): Bm25Index = {
    val stats = a.stats.select(col("n_docs").as("n1"), col("sum_dl").as("s1"))
      .crossJoin(b.stats.select(col("n_docs").as("n2"), col("sum_dl").as("s2")))
      .select((col("n1") + col("n2")).as("n_docs"),
        (col("s1") + col("s2")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    Bm25Index(a.postings.unionByName(b.postings), stats)
  }

  /** Write `batch`'s standalone index under `dir` as ONE batch
    * partition: postings → `dir/postings/batch_id=N`, the 1-row stats →
    * `dir/stats/batch_id=N`, both with overwrite — a replayed batch id
    * REPLACES its partitions instead of appending duplicates
    * (effectively-once per batch id, the DocDedupStream sink
    * discipline). The on-disk artifact the streaming binding
    * (`streaming/RetrievalStream.indexToParquet`) accumulates. `batch`
    * must not itself read from `dir` — overwrite deletes the files a
    * still-lazy plan would scan. */
  def bm25IndexAppend(batch: DataFrame, idCol: Column, toksCol: Column,
                      dir: String, batchId: Long): Unit =
    scala.util.Using.resource(new CacheScope) { sc =>
      val ix = bm25Index(batch, idCol, toksCol, sc)
      ix.postings.write.mode("overwrite")
        .parquet(s"$dir/postings/batch_id=$batchId")
      ix.stats.write.mode("overwrite")
        .parquet(s"$dir/stats/batch_id=$batchId")
    }

  /** Load the accumulated on-disk index: postings by partition
    * discovery; stats recombined EXACTLY from the per-batch long rows
    * (the [[bm25IndexMerge]] algebra), so the loaded index scores
    * bit-identically to one built over all ingested docs at once. */
  def bm25IndexLoad(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Bm25Index = {
    val postings = spark.read.parquet(s"$dir/postings")
      .select("doc", "dl", "token", "tf")
    val stats = spark.read.parquet(s"$dir/stats")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
    Bm25Index(postings, stats)
  }

  /** Compact an accumulated on-disk index into a fresh single-batch
    * layout — the small-files remedy for a long-running
    * [[graft.streaming.RetrievalStream]] ingestion (thousands of
    * `batch_id=N` partitions × shuffle-partition part files otherwise
    * accumulate, and file-listing cost eventually dominates query
    * planning). Postings rewrite under `outDir/postings/batch_id=0`
    * (optionally coalesced to `targetPartitions`), the per-batch stats
    * rows collapse to ONE exact recombined row — so
    * [[bm25IndexLoad]](outDir) scores bit-identically to the
    * uncompacted dir (spec-pinned). Writes to a NEW dir: compact,
    * verify, swap — never in place (the overwrite-while-reading hazard
    * documented on [[bm25IndexAppend]]). */
  def bm25IndexCompact(spark: org.apache.spark.sql.SparkSession,
                       dir: String, outDir: String,
                       targetPartitions: Int = 0): Unit = {
    require(new java.io.File(dir).getCanonicalPath !=
      new java.io.File(outDir).getCanonicalPath,
      "compact to a NEW directory, never in place")
    val ix = bm25IndexLoad(spark, dir)
    val p = if (targetPartitions > 0) ix.postings.coalesce(targetPartitions)
            else ix.postings
    p.write.mode("overwrite").parquet(s"$outDir/postings/batch_id=0")
    ix.stats.select("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(s"$outDir/stats/batch_id=0")
  }

  /** BM25 top-k per query over a prebuilt index. `queries` carries
    * (qidCol, qtoksCol); query tokens deduplicate to a term SET (BM25
    * treats the query as a set — repeating a query term must not double
    * its weight). Output: (qid, doc, bm25_micro, rank) — `bm25_micro` is
    * the exact integer Σ round(w·10⁶), rank 1..k by (bm25_micro DESC,
    * doc), map-side pruned via WindowGroupLimit. Docs sharing no term
    * with a query are absent (score 0 — the inverted-index contract).
    *
    * The query batch is broadcast twice (term set, term→qid map); the
    * operator targets retrieval batches, not corpus×corpus self-joins —
    * for those use the dedup family. */
  def bm25TopKFromIndex(ix: Bm25Index, queries: DataFrame,
                        qidCol: Column, qtoksCol: Column, k: Int,
                        k1: Double = 1.2, b: Double = 0.75,
                        scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // (qid, token) is read twice (term-set prune + fan-out join); persisted
    // so a query batch derived FROM the corpus doesn't scan it twice
    val qt = scope.persist(queries.select(qidCol.as("qid"),
      explode(array_distinct(qtoksCol)).as("token")))
    val qterms = qt.select("token").distinct()
    val pruned = ix.postings.join(broadcast(qterms), "token")
    // one row per (doc, token) in `pruned`, so df = plain row count
    val dfreq = pruned.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val sat = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    val weighted = pruned
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(ix.stats))
      .select(col("token"), col("doc"),
        round(idf * sat * lit(1e6), 0).cast("long").as("w_micro"))
    val scored = weighted.join(broadcast(qt), "token")
      .groupBy(col("qid"), col("doc"))
      .agg(sum(col("w_micro")).as("bm25_micro"))
    Relational.topKPerGroup(scored, Seq(col("qid")),
      Seq(col("bm25_micro").desc, col("doc")), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("int"))
  }

  /** One-shot convenience: build the index (scope-persisted) and query it. */
  def bm25TopK(corpus: DataFrame, idCol: Column, toksCol: Column,
               queries: DataFrame, qidCol: Column, qtoksCol: Column, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               scope: CacheScope = CacheScope.unmanaged): DataFrame =
    bm25TopKFromIndex(bm25Index(corpus, idCol, toksCol, scope),
      queries, qidCol, qtoksCol, k, k1, b, scope)

  /** Dense rerank of a candidate list — the second stage of the
    * production retrieve-then-rerank stack: a cheap high-recall first
    * stage (BM25 top-N, an IVF probe) nominates candidates, and the
    * precise scorer re-ranks ONLY those. `candidates` carries
    * (qid, doc); embeddings join in from `queryVecs` (qid, qv — the
    * query batch, broadcast) and `docVecs` (doc, v — corpus-sized, but
    * only candidate rows survive the join, so the scoring cost is
    * |candidates|, never corpus). Top-k per qid by (dot DESC, doc),
    * map-side pruned. Same output shape as the other rankers, so the
    * result feeds [[rrfFuse]] directly. */
  def rerankDense(candidates: DataFrame, queryVecs: DataFrame,
                  docVecs: DataFrame, k: Int): DataFrame = {
    val scored = candidates.select("qid", "doc")
      .join(docVecs, "doc")
      .join(broadcast(queryVecs), "qid")
      .select(col("qid"), col("doc"),
        graft.similarity.Similarity.dot(col("qv"), col("v")).as("dot"))
    Relational.topKPerGroup(scored, Seq(col("qid")),
      Seq(desc("dot"), col("doc")), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("int"))
  }

  /** Reciprocal-rank fusion across ranked lists (each a DataFrame with
    * columns qid, doc, rank): rrf(q,d) = Σ_lists 10⁹ div (k0 + rank) —
    * integer division, so contributions and sums are exact longs (no
    * float summation order, engine-portable by construction). A doc
    * absent from a list contributes nothing from it; k0 = 60 is the
    * standard damping (Cormack et al.). Output: (qid, doc, rrf_nano,
    * rank 1..k by rrf_nano DESC, doc).
    *
    * The fused frames are top-k lists — |queries|·k rows — so the union
    * + re-aggregate is telemetry-sized regardless of corpus scale. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    val contrib = rankings.map(_.select(col("qid"), col("doc"),
      expr(s"cast(1000000000 as bigint) div ($k0 + cast(rank as bigint))")
        .as("c")))
    val fused = contrib.reduce(_ unionByName _)
      .groupBy(col("qid"), col("doc"))
      .agg(sum(col("c")).as("rrf_nano"))
    Relational.topKPerGroup(fused, Seq(col("qid")),
      Seq(col("rrf_nano").desc, col("doc")), k, rankCol = "rank")
      .withColumn("rank", col("rank").cast("int"))
  }
}

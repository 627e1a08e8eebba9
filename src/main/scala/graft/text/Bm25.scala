package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact BM25 retrieval (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") — the lexical
  * retrieval primitive an LLM data pipeline uses for retrieval-based
  * decontamination ("which training documents does this eval prompt
  * retrieve?"), data selection, and nearest-document audits. The
  * reference's keyword/top-k overlap matching
  * (`method_2/pipleline_2.py` column keyword sets) is the same gesture
  * at column grain; this is the document-grain, ranked form.
  *
  * Scoring is BM25 with k1 = 6/5 and b = 3/4 (the textbook defaults as
  * exact rationals), carried out ENTIRELY in Long arithmetic so the
  * result hash-oracles cross-engine (the [[LanguageModel]] discipline):
  *
  *   idf_fp(t)  = lg2_fp(Q_idf) − 16·F,
  *                Q_idf = clamp(⌊(2N+2)·2¹⁶ / (2·df+1)⌋,
  *                1, 2³⁰) — the Robertson idf (N−df+½)/(df+½)+1 =
  *                (N+1)/(df+½) doubled through to integers, at the
  *                2¹⁶ probability scale of the shared lg2 ladder, minus
  *                its 16·F bias (Q_idf ≥ 2¹⁶ whenever df ≤ N, so the
  *                bias subtraction never goes negative);
  *   rel_fp(d)  = ⌊dl·S / max(1, ⌊T/N⌋)⌋ — dl/avgdl at scale S = 2¹⁰;
  *   sat_fp(t,d)= ⌊44·tf·S² / (20·tf·S + 6·S + 18·rel_fp)⌋ — the
  *                tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) saturation
  *                with k1+1 = 11/5 and k1·(1−b) = 3/10, k1·b = 9/10
  *                multiplied through by 20·S;
  *   score_fp(q,d) = Σ_{t ∈ q} idf_fp(t) · sat_fp(t,d).
  *
  * Overflow envelope (by construction, corpus-size-independent): the
  * saturation numerator 44·tf·S² ≤ 2²⁶·tf needs only tf < 2³⁷ (a
  * single document's term count); the idf numerator (2N+2)·2¹⁶ is
  * Long-exact to N < 2⁴⁶ documents; Q_idf clamps to the ladder domain
  * [1, 2³⁰] (idf saturates at ~14 bits once N/df exceeds 2¹⁴ — a
  * documented rank-precision floor, ties broken by doc_id); each
  * contribution ≤ 30·2¹⁶·⌈2.2·S⌉ < 2³², so a Long sum holds 2³¹ terms.
  * NO corpus-total product appears anywhere — unlike the naive
  * cross-multiplied form 44·tf·T·S, which leaves Long at ~10¹³ total
  * tokens, this scales to any corpus.
  *
  * Scale shape (100 TB): postings = one explode + one
  * (doc, term)-grain count (map-side combinable); candidate selection
  * and df both run AFTER the broadcast query-term semi-join, so the
  * per-term work is bounded by the documents that share a query term,
  * never the corpus vocabulary; pair scoring reads only the
  * [[Champions]]-truncated impact-ordered posting lists, so the
  * (queries × documents) matrix can never go dense on a stop-word
  * query term; the final ranking is [[graft.ops.Scale.saltedTopK]]
  * (no single-task hot-query window). Query sets are eval
  * benchmarks — thousands of rows — so every join against them
  * broadcasts.
  */
object Bm25 {

  /** Saturation scale (2¹⁰). */
  val S: Long = 1024L

  import LanguageModel.{F, PScale, ldiv, eF, pow2}

  /** lg2_fp(q) = e·F + ⌊q·F / 2ᵉ⌋ − F for q ∈ [1, 2³⁰] — the signed
    * counterpart of [[LanguageModel.nllFp]] over the same ladder. */
  private def lg2Fp(q: Column): Column =
    eF(q) + ldiv(q * lit(F), pow2(q)) - lit(F)

  /** (id, dl, term, tf) — one row per distinct (document, term), with
    * the document's token length carried in the grouping key (it is
    * functionally determined by id, so this costs nothing and saves a
    * join). Tokens are the engine-wide lowercased [a-z0-9] runs. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ws = graft.functions.TokenArray.asciiTokens(col(s"`$textCol`"))
    docs.select(col(s"`$idCol`").as("id"), ws.as("__ws"))
      .select(col("id"), size(col("__ws")).cast("long").as("dl"),
        explode(col("__ws")).as("term"))
      .groupBy("id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
  }

  /** Broadcast 1-row corpus statistics: N documents, avgdl =
    * max(1, ⌊total tokens / N⌋). */
  def totals(docs: DataFrame, textCol: String): DataFrame = {
    val ws = graft.functions.TokenArray.asciiTokens(col(s"`$textCol`"))
    broadcast(docs.select(size(ws).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(col("__dl")), lit(0L)).as("__tt"))
      .select(col("__n"),
        greatest(ldiv(col("__tt"), greatest(col("__n"), lit(1L))), lit(1L))
          .as("__avgdl")))
  }

  /** Champion-list length: per query term, only the [[Champions]]
    * documents with the highest saturation term score enter pair
    * scoring — the classical impact-ordered posting truncation
    * (Strohman & Croft's champion lists; the d2 stop-shingle df cap's
    * retrieval twin). Without it a stop-word query term pairs every
    * query against most of the corpus — the dense (queries × docs)
    * matrix is the quadratic blowup that kills a naive BM25 join at
    * scale (measured: the untruncated form ground past 10 min on the
    * ×10 rehearsal; truncated: seconds). Results are EXACT whenever a
    * term's posting list fits the cap (always at the oracle SF);
    * truncation is deterministic — (sat desc, doc_id) is a total
    * order — and the mirror replays it, so the cross-engine hash
    * holds at every SF either way. */
  val Champions = 2000

  /** BM25 scores for (query, document) pairs sharing at least one
    * champion term posting: (query_id, doc_id, score_fp). `queries`
    * is the DISTINCT (query_id, term) frame — eval-set sized,
    * broadcast on every use. A query's own document (doc_id =
    * query_id) is excluded, the s1 self-pair convention. */
  def score(docs: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, champions: Int = Champions,
      post: Option[DataFrame] = None): DataFrame = {
    val qdist = queries.select("term").distinct()
    // semi-join FIRST: df and candidates both touch only postings whose
    // term occurs in some query — the corpus-wide vocabulary never
    // aggregates. Callers that already built (and persisted) the
    // postings frame pass it in — the explode + (doc, term) agg is the
    // operator's dominant corpus pass, not worth running twice.
    val tot = totals(docs, textCol)
    val rel = ldiv(col("dl") * lit(S), col("__avgdl"))
    val sat = ldiv(col("tf") * lit(44L * S * S),
      col("tf") * lit(20L * S) + lit(6L * S) + rel * 18L)
    val cand = graft.ops.StagePersists.track(
      post.getOrElse(postings(docs, textCol, idCol))
        .join(broadcast(qdist), Seq("term"))
        .crossJoin(tot)
        .select(col("term"), col("id"), sat.as("__sat")))
    // df counts the FULL posting list (truncation prunes candidates,
    // not the statistics)
    val dfreq = cand.groupBy("term").agg(count(lit(1)).as("__df"))
    val champ = graft.ops.Scale.saltedTopK(cand, Seq(col("term")),
        Seq(col("__sat").desc, col("id")), champions, col("id"), "__crk")
      .drop("__crk")
    val qidf = least(greatest(
      ldiv((col("__n") * 2L + 2L) * lit(F), col("__df") * 2L + 1L),
      lit(1L)), lit(PScale))
    champ.join(broadcast(queries), Seq("term"))
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(tot)
      .select(col("query_id"), col("id").as("doc_id"),
        ((lg2Fp(qidf) - lit(16L * F)) * col("__sat")).as("__contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum("__contrib").as("score_fp"))
  }

  // ---- incremental index state (the d13/s10 pattern) ---------------------

  /** The stored BM25 index state: the (doc, term) postings frame, the
    * per-term document frequencies, and the 1-row (n_docs,
    * total_tokens) corpus sums. Every component is ADDITIVE across
    * disjoint dumps — postings rows are doc-grain (disjoint ids never
    * collide), df and the totals are sums — so incremental
    * maintenance is EXACT: fold(state(old), state(new)) ≡
    * state(old ∪ new), down to avgdl = max(1, ⌊T/N⌋) recomputed from
    * the folded sums (Bm25StateSpec pins it). A new crawl dump updates
    * the index by counting only its own tokens, never re-scanning the
    * corpus. */
  final case class State(post: DataFrame, dfreq: DataFrame,
      sums: DataFrame)

  def buildState(docs: DataFrame, textCol: String,
      idCol: String): State = {
    val ws = graft.functions.TokenArray.asciiTokens(col(s"`$textCol`"))
    val post = postings(docs, textCol, idCol)
    State(post,
      post.groupBy("term").agg(count(lit(1)).as("__df")),
      docs.select(size(ws).cast("long").as("__dl"))
        .agg(count(lit(1)).as("__n"),
          coalesce(sum(col("__dl")), lit(0L)).as("__tt")))
  }

  /** Fold a new dump's state into the stored one — one union per
    * component plus term-sized/1-row sums; the corpus-sized postings
    * frame is APPEND-ONLY. */
  def foldState(stored: State, batch: State): State = State(
    stored.post.unionByName(batch.post),
    stored.dfreq.unionByName(batch.dfreq).groupBy("term")
      .agg(sum("__df").as("__df")),
    stored.sums.unionByName(batch.sums)
      .agg(sum("__n").as("__n"), sum("__tt").as("__tt")))

  /** [[score]] against a maintained [[State]] — identical arithmetic,
    * the statistics read from the state instead of being recomputed
    * (the stored df covers the FULL vocabulary; the broadcast
    * semi-join restricts it to query terms). */
  def scoreFromState(state: State, queries: DataFrame,
      champions: Int = Champions): DataFrame = {
    val qdist = queries.select("term").distinct()
    val tot = broadcast(state.sums.select(col("__n"),
      greatest(ldiv(col("__tt"), greatest(col("__n"), lit(1L))), lit(1L))
        .as("__avgdl")))
    val rel = ldiv(col("dl") * lit(S), col("__avgdl"))
    val sat = ldiv(col("tf") * lit(44L * S * S),
      col("tf") * lit(20L * S) + lit(6L * S) + rel * 18L)
    val cand = graft.ops.StagePersists.track(
      state.post.join(broadcast(qdist), Seq("term"))
        .crossJoin(tot)
        .select(col("term"), col("id"), sat.as("__sat")))
    val dfq = state.dfreq.join(broadcast(qdist), Seq("term"))
    val champ = graft.ops.Scale.saltedTopK(cand, Seq(col("term")),
        Seq(col("__sat").desc, col("id")), champions, col("id"), "__crk")
      .drop("__crk")
    val qidf = least(greatest(
      ldiv((col("__n") * 2L + 2L) * lit(F), col("__df") * 2L + 1L),
      lit(1L)), lit(PScale))
    champ.join(broadcast(queries), Seq("term"))
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(dfq), Seq("term"))
      .crossJoin(tot)
      .select(col("query_id"), col("id").as("doc_id"),
        ((lg2Fp(qidf) - lit(16L * F)) * col("__sat")).as("__contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum("__contrib").as("score_fp"))
  }

  /** Collect the query-term statistics into the dense CSR form
    * [[graft.functions.Bm25Score]] consumes — the DEPLOYED model:
    * idf per term from the TRAINING corpus (same clamped-ladder form
    * as [[score]]), term → query memberships, avgdl. Everything
    * collected is eval-set sized (query terms × queries) — a
    * control-plane frame; the corpus contributes only its df counts
    * for the query terms (computed behind the same broadcast
    * semi-join) and the one totals row. */
  def denseModel(docs: DataFrame, queries: DataFrame, textCol: String,
      idCol: String,
      post: Option[DataFrame] = None): graft.functions.Bm25Score.Model = {
    val qrows = queries.select(col("query_id").cast("long"), col("term"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val qids = qrows.map(_._1).distinct.sorted
    val qpos = qids.zipWithIndex.toMap
    val terms = qrows.map(_._2).distinct.sorted
    val tpos = terms.zipWithIndex.toMap
    val qdist = queries.select("term").distinct()
    val dfm = post.getOrElse(postings(docs, textCol, idCol))
      .join(broadcast(qdist), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("__df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = totals(docs, textCol).collect()(0)
    val (n, avgdl) = (tot.getLong(0), tot.getLong(1))
    val idf = terms.map { t =>
      val df = dfm.getOrElse(t, 0L)
      // absent terms keep idf 0 — they never match a token anyway
      if (df == 0L) 0L
      else {
        val q = math.min(math.max((2L * n + 2L) * F / (2L * df + 1L), 1L),
          PScale)
        val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
        e * F + (q * F) / (1L << e) - 17L * F
      }
    }
    val byTerm = qrows.groupBy(_._2)
    val off = new Array[Int](terms.length + 1)
    val qidx = scala.collection.mutable.ArrayBuffer[Int]()
    terms.zipWithIndex.foreach { case (t, i) =>
      off(i) = qidx.length
      byTerm(t).map(r => qpos(r._1)).sorted.foreach(qidx += _)
    }
    off(terms.length) = qidx.length
    new graft.functions.Bm25Score.Model(terms.toArray, idf.toArray,
      off, qidx.toArray, qids.toArray, avgdl)
  }

  /** Top-k retrieval per query: (query_id, doc_id, score_fp, rk),
    * ranked by (score_fp desc, doc_id) — a total order, so the result
    * is deterministic. Salted two-phase top-k: a hot query (one that
    * matches half the corpus) never lands in a single task. */
  def topK(docs: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, k: Int, post: Option[DataFrame] = None): DataFrame =
    graft.ops.Scale.saltedTopK(
      score(docs, queries, textCol, idCol, Champions, post),
      Seq(col("query_id")), Seq(col("score_fp").desc, col("doc_id")),
      k, col("doc_id"), "rk")
}

package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for training-data pipelines (beyond-reference
  * surface, BASELINE.json north star). All pure Catalyst expressions —
  * codegen'd, pushdown-friendly, no UDFs.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count: word pieces = letter runs + digit runs (the
    * standard pre-tokenizer shape; extraction not split, so the regex stays
    * lookaround-free and portable to the oracle dialect). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+"), lit(0)))

  /** Language-ID heuristic: score = stopword hits per language, argmax.
    * N-gram-free but the same shape as a real char-n-gram scorer: a few
    * regexp counts + greatest(). Returns 2-letter code or 'und'. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "ist"))

  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val pat = words.mkString("\\b(", "|", ")\\b")
    size(regexp_extract_all(lower(text), lit(pat), lit(0)))
  }

  def langId(text: Column): Column = {
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(text, words).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*) // struct comparison: score then lang
    when(best("score") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Quality score in [0,1]: blend of length, punctuation ratio, stopword
    * ratio, mean word length — the classic heuristic-filter shape
    * (C4/Gopher-style rules). */
  def qualityScore(text: Column): Column =
    qualityFromCounts(
      length(text).cast("double"),
      tokenCount(text).cast("double"),
      size(regexp_extract_all(text, lit("[\\.,;:!\\?]"), lit(0))).cast("double"),
      stopwordHits(text, stopwords("en")).cast("double"))

  private def qualityFromCounts(nChars: Column, nTokens: Column,
                                nPunct: Column, nStop: Column): Column = {
    val meanWordLen = nChars / greatest(nTokens, lit(1.0))
    val lengthOk = least(nTokens / lit(50.0), lit(1.0))                  // prefer ≥50 tokens
    val punctOk = least(nPunct / greatest(nTokens / lit(10.0), lit(1.0)), lit(1.0))
    val stopOk = least(nStop / greatest(nTokens / lit(20.0), lit(1.0)), lit(1.0))
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 10, lit(1.0)).otherwise(lit(0.5))
    round((lengthOk * 0.4 + punctOk * 0.2 + stopOk * 0.2 + wordLenOk * 0.2), 4)
  }

  /** `docs` plus a `quality` column, with the shared counts bound as
    * ATTRIBUTES first: [[qualityScore]] as a single Column references the
    * token split five times, and higher-order functions are excluded from
    * codegen subexpression elimination, so the regex split would run five
    * times per row — the dominant scalar cost of a quality pass at corpus
    * scale. The two-projection form computes each count once (the non-cheap
    * multi-referenced aliases keep the CollapseProject barrier) and codegen
    * pipelines the attribute values within the stage. */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumns(Map(
        "__nchars" -> length(t).cast("double"),
        "__ntok" -> tokenCount(t).cast("double"),
        "__npunct" -> size(regexp_extract_all(t, lit("[\\.,;:!\\?]"), lit(0))).cast("double"),
        "__nstop" -> stopwordHits(t, stopwords("en")).cast("double")))
      .withColumn("quality", qualityFromCounts(
        col("__nchars"), col("__ntok"), col("__npunct"), col("__nstop")))
      .drop("__nchars", "__ntok", "__npunct", "__nstop")
  }

  /** Overlapping token-window chunks — context-window packing for training
    * pipelines: starts at 0, stride, 2·stride…; each chunk is up to
    * `window` tokens rejoined. `toks` must be an ATTRIBUTE (select the
    * token array into a column first) so Catalyst doesn't re-split the
    * text once per chunk. Pure higher-order functions, codegen'd. */
  def chunkTexts(toks: Column, window: Int, stride: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      st => concat_ws(" ", slice(toks, st + 1, lit(window))))

  /** Deterministic train/val/test split: bucket = portable id-hash mod 100,
    * split by percentile cuts. Replayable across runs AND engines (no RNG,
    * no partition-order dependence, unlike `randomSplit`), and appending
    * data never reassigns existing docs — the property training pipelines
    * need for stable eval sets. A narrow per-row map: no shuffle at 100 TB.
    */
  def hashSplit(docs: DataFrame, idCol: String = "doc_id",
                trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct <= 100, "split percentages exceed 100")
    docs
      .withColumn("bucket",
        (PortableHash.hash32(col(idCol).cast("string")) % 100).cast("int"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Gopher-style repetition signals per document — the quality rules that
    * catch degenerate/spammy text that length and punctuation ratios miss:
    *
    *  - `uniq_token_ratio`:  |distinct tokens| / |tokens|
    *  - `dup_bigram_frac`:   fraction of bigram occurrences beyond each
    *                         bigram's first (Rae et al. 2021 §A1.1)
    *  - `top_bigram_frac`:   share of the single most frequent bigram
    *
    * Token-level stats are pure array expressions fused into the scan (no
    * shuffle); bigram stats hash each bigram to a long and aggregate
    * (doc, hash) — both aggregates map-side combined, shuffle rows are two
    * longs + a count. Docs with < 2 tokens get null bigram fractions. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val tokStats = toks.select(col("doc_id"),
      size(col("toks")).as("n_tokens"),
      round(size(array_distinct(col("toks"))).cast("double") /
        greatest(size(col("toks")), lit(1)), 4).as("uniq_token_ratio"))
    val bigrams = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat(element_at(col("toks"), i), lit(" "),
            element_at(col("toks"), i + 1)))).as("bg"))
      .select(col("doc_id"), PortableHash.hash32(col("bg")).as("h"))
    val perBigram = bigrams.groupBy("doc_id", "h").agg(count(lit(1)).as("n"))
    val bgStats = perBigram.groupBy("doc_id")
      .agg(sum("n").as("nb"), count(lit(1)).as("nd"), max("n").as("tn"))
      .select(col("doc_id"),
        round((col("nb") - col("nd")).cast("double") / col("nb"), 4)
          .as("dup_bigram_frac"),
        round(col("tn").cast("double") / col("nb"), 4).as("top_bigram_frac"))
    tokStats.join(bgStats, Seq("doc_id"), "left")
  }

  /** Deterministic stratified sampling: per-group keep percentages via a
    * salted portable id hash — the language/domain rebalancing step of a
    * data-mix pipeline. No RNG: replayable across engines and runs, and
    * appending data never resamples existing rows (`sample()` can't
    * promise either). A narrow map + filter fused into the scan; zero
    * shuffle at 100 TB. `rates` maps group value → keep percent [0,100];
    * groups not listed keep `defaultPct`. The salt decorrelates the sample
    * from [[hashSplit]]'s buckets (same id-hash family, different key). */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       groupCol: String = "lang", idCol: String = "doc_id",
                       defaultPct: Int = 0, salt: String = "strat"): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "keep percentages must be in [0, 100]")
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    docs.withColumn("bucket",
        (PortableHash.hash32(concat(lit(salt + ":"), col(idCol).cast("string")))
          % 100).cast("int"))
      .filter(col("bucket") < rate)
  }

  /** TF-IDF term weights per document: tf = in-doc term count, smoothed
    * idf = ln((N+1)/(df+1)) + 1. Both aggregates are map-side combined;
    * the 1-row corpus count broadcasts; only (doc, term, count) triples —
    * never documents — cross the wire. */
  /** Per-language quality gate — keep the top `keepNum/keepDen` fraction of
    * documents by [[qualityScore]] within each `groupCol` value (quality-
    * based corpus pruning, the CCNet/FineWeb "keep the best slice per
    * language" step). The keep count is the exact integer
    * `max(1, n*keepNum/keepDen)` — a rational, not a float threshold, so
    * the boundary can never flip between engines — and ties inside a
    * quality value break on doc_id, so the kept set is fully deterministic
    * and append-stable given a stable corpus.
    *
    * Scale shape: the per-group doc counts are one map-side-combined
    * aggregate broadcast back (control-plane small — one row per language);
    * the rank is one window sort keyed by the group. At 100 TB the sort is
    * the inherent cost of an exact top-fraction; when approximate is
    * acceptable, swap the rank for an `approx_percentile` threshold
    * broadcast and keep the same filter shape. */
  def qualityGate(docs: DataFrame, keepNum: Int = 3, keepDen: Int = 10,
                  groupCol: String = "lang"): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum, "keep fraction must be in (0, 1]")
    val scored = withQuality(docs).select(col("doc_id"), col(groupCol), col("quality"))
    val counts = scored.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(groupCol).orderBy(col("quality").desc, col("doc_id").asc)
    scored
      .join(broadcast(counts), groupCol)
      .withColumn("__rk", row_number().over(w))
      // (n*keepNum)/keepDen in doubles is floor-exact: the quotient only
      // lands on an integer when keepDen divides n*keepNum, and then the
      // IEEE division is exact — so this equals integer division
      .filter(col("__rk") <= greatest(lit(1), floor(col("__n") * keepNum / keepDen)))
      .select(col("doc_id"), col(groupCol), col("quality"))
  }

  /** Greedy per-group token-budget sampling: walk each group's documents in
    * portable-hash order (a deterministic shuffle — no RNG state, so the
    * sample replays identically anywhere) and keep documents while the
    * running token total stays within `budget` — the "downsample each
    * source to its token allocation" step of training-data mixing.
    *
    * Scale shape: one window cumsum per group (shuffle by `groupCol`, sort
    * by hash). A single 100 TB mega-source serializes its own sort — shard
    * such a source into salted sub-groups with proportional sub-budgets
    * (the [[graft.operators.Skew]] pattern) and the semantics compose. */
  def tokenBudgetSample(docs: DataFrame, budget: Long,
                        groupCol: String = "source"): DataFrame = {
    val toks = docs.select(col("doc_id"), col(groupCol),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      PortableHash.hash32(col("doc_id").cast("string")).as("__h"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col(groupCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Mixture resampling toward target DOMAIN WEIGHTS under a global doc
    * budget — the Pile/Dolma-style mixture-balancing step between raw
    * crawl proportions and the training distribution. Domain k's quota is
    * ⌊budget · wₖ / Σw⌋ docs (exact integer rational — no float weights,
    * so every engine computes the same quota), filled in deterministic
    * hash-rank order (salted 32-bit hash, doc-id tiebreak): reruns,
    * engines, and partial recomputes all select the identical doc set. A
    * domain short of its quota contributes everything it has; the
    * shortfall stays VISIBLE (`mix_rank`/`mix_quota` in the output) —
    * no silent redistribution.
    *
    * Scale shape: one window rank partitioned by the domain key — the
    * sort is per-domain, parallelism scales with domain count. For a
    * degenerate domain holding most of the corpus, the exact rank order
    * can be replaced by a hash-cutoff search at the same contract; this
    * exact form is the oracle-checkable spec of that contract. */
  def mixtureSample(docs: DataFrame, weights: Map[String, Long], budget: Long,
                    groupCol: String = "source", idCol: String = "doc_id",
                    salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, "mixture weights must be non-negative, sum > 0")
    require(budget >= 0, "budget must be non-negative")
    val sumW = weights.values.sum
    val quota = weights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (k, w)) =>
        when(col(groupCol) === k, lit(budget * w / sumW)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(PortableHash.hash32(
        concat(lit(salt + ":"), col(idCol).cast("string"))).asc, col(idCol).asc)
    docs
      .withColumn("mix_rank", row_number().over(w).cast("long"))
      .withColumn("mix_quota", quota)
      .filter(col("mix_rank") <= col("mix_quota"))
  }

  /** Unigram-surprisal score — the LM-scoring step of a CCNet-style
    * pipeline with the corpus's OWN unigram distribution standing in for
    * the external language model: surprisal(doc) = mean over tokens of
    * −ln p(tok), p = corpus frequency / corpus token count. Low = common/
    * templated text, high = rare-token-heavy; curation keeps the middle
    * band. Each token's surprisal is quantized to integer micro-nats
    * (half-up at 1e-6) BEFORE the per-doc sum, so the aggregate is exact
    * integer arithmetic — float accumulation order can never vary the
    * result, in this engine or any oracle.
    *
    * Scale shape: one explode over corpus tokens (the relation every dedup
    * op already shuffles), a map-side-combined frequency aggregate, a
    * 1-row broadcast total, and a token-keyed equi-join back (the
    * frequency table is vocabulary-sized — broadcastable in practice). */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    // per-doc kernel tf (see termFreqs): the per-token micro quantization
    // happens BEFORE the per-doc sum, so Σ over occurrences ≡ Σ tf·micro
    // over distinct terms — exact integer equality, and the pinned
    // relation shrinks from corpus occurrences to distinct (doc, term)
    // pairs built with no exchange
    val tok = graft.core.Caching.shared(termFreqs(docs))
    // the frequency table feeds the total AND the join probe; without the
    // persist the second consumer re-runs the whole corpus tokenize.
    // It is vocabulary-sized — the cheap thing to pin at 100 TB.
    val freq = graft.core.Caching.shared(
      tok.groupBy("tok").agg(sum(col("tf")).as("__tf")))
    val total = freq.agg(sum(col("__tf")).as("__total"))
    tok.join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("__micro",
        floor(-log(col("__tf").cast("double") / col("__total")) * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"), sum(col("tf") * col("__micro")).as("__sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__sum").cast("double") / col("n_tokens") / 1e6, 4).as("surprisal"))
  }

  /** DSIR-style importance weights (Xie et al., NeurIPS'23 — data
    * selection via importance resampling): per-doc log importance
    * Σ_tok [ln p_target(tok) − ln p_corpus(tok)] under add-one-smoothed
    * unigram models over the SHARED vocabulary, the reweighting score
    * that tilts a general corpus toward a target domain. `isTarget`
    * marks the target slice (a seed corpus / domain exemplar set).
    *
    * Exactness: the per-token log-ratio quantizes to integer micro-nats
    * BEFORE the per-doc sum (the t15/t17 discipline) — order-independent,
    * hash-comparable. Scale shape: ONE corpus explode pinned across the
    * model census and the scoring join; both model tables are
    * vocabulary-sized; totals ride as a 1-row broadcast. */
  def importanceWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    // per-doc kernel tf (see termFreqs): per-token micro-nats quantize
    // before the doc sum, so Σ over occurrences ≡ Σ tf·micro over
    // distinct terms — exact; the pinned relation shrinks to distinct
    // (doc, term, tf) pairs built with no exchange
    val tok = graft.core.Caching.shared(
      docs.select(col("doc_id"), isTarget.as("__tgt"),
        explode(graft.functions.TextKernels
          .termCounts(split(lower(col("text")), "\\s+"))).as("__tc"))
        .select(col("doc_id"), col("__tgt"),
          col("__tc.tok").as("tok"), col("__tc.tf").as("tf")))
    // vocabulary-sized; feeds the totals AND the scoring join
    val freq = graft.core.Caching.shared(tok.groupBy("tok").agg(
      sum(when(col("__tgt"), col("tf")).otherwise(0L)).as("__ct"),
      sum(col("tf")).as("__call")))
    val totals = freq.agg(sum("__ct").as("__nt"), sum("__call").as("__nc"),
      count(lit(1)).as("__v"))
    tok.join(freq, "tok")
      .crossJoin(broadcast(totals))
      .withColumn("__micro",
        floor((log((col("__ct") + 1).cast("double") / (col("__nt") + col("__v"))) -
          log((col("__call") + 1).cast("double") / (col("__nc") + col("__v"))))
          * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"), sum(col("tf") * col("__micro")).as("logweight_micro"))
  }

  /** The (doc_id, tok, tf) relation every sparse-text scorer starts from,
    * via the per-document kernel fold (TextKernels.termCounts, round 16):
    * term counting is doc-LOCAL, so as a kernel it needs NO exchange,
    * where the old explode→groupBy(doc_id, tok) shuffled one row per
    * corpus token occurrence — at 100 TB the largest exchange of every
    * tf-consuming pipeline. Identical rows; downstream df/dl aggregates
    * keep their (distinct-pair-sized) exchanges. */
  private[operators] def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(graft.functions.TextKernels
        .termCounts(split(lower(col("text")), "\\s+"))).as("__tc"))
      .select(col("doc_id"), col("__tc.tok").as("tok"), col("__tc.tf").as("tf"))

  def tfidf(docs: DataFrame): DataFrame = {
    // tf feeds both the weight projection and the df aggregate; persist so
    // the corpus tokenize+count runs once (PLANS.md flagged the re-derive)
    val tf = graft.core.Caching.shared(termFreqs(docs))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count_distinct(col("doc_id")).as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1))
      .select("doc_id", "tok", "tf", "df", "tfidf")
  }

  /** Okapi BM25 relevance of every document to a fixed bag-of-words query —
    * the retrieval scorer of a data-selection pipeline (rank a 100 TB corpus
    * against a target distribution / seed set, keep the head). k1 = 1.2,
    * b = 0.75 (the standard constants);
    * idf(t) = ln(1 + (N − df + ½)/(df + ½)) is the non-negative variant.
    *
    * Exactness discipline (same as [[unigramSurprisal]]): every per-term
    * partial score quantizes to integer micro-units BEFORE the per-doc sum,
    * so the aggregate is order-independent integer arithmetic — the only
    * float ops are per-row scalar expressions both engines evaluate
    * identically. `score_micro` is the ranking key (ties by doc id);
    * `bm25` is its 4-decimal display form.
    *
    * Scale shape: the corpus explodes once into the (doc, term, tf)
    * relation every other text op already shuffles; df and the (N, avgdl)
    * pair are vocabulary- and 1-row-sized broadcasts; the query-term filter
    * prunes the scored relation to |q| rows per doc BEFORE any join. No
    * per-query corpus pass: `queryTerms` is a plan-time literal set, so
    * scoring k queries batches into one scan with a query-id column. */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    // tf feeds doc lengths, document frequencies, AND the scored relation —
    // pin it once (vocabulary × doc sized, the cheap thing at 100 TB);
    // built shuffle-free by the per-doc kernel (see termFreqs)
    val tf = graft.core.Caching.shared(termFreqs(docs))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    // df is only ever consumed for the query terms — filter BEFORE the
    // aggregate so the vocabulary-wide shuffle collapses to |q| map-side-
    // combined counts, and the join becomes a |q|-row broadcast
    val dfreq = tf.filter(col("tok").isin(queryTerms: _*))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    tf.filter(col("tok").isin(queryTerms: _*))
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__term",
        col("__idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("__micro", floor(col("__term") * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("__micro").as("score_micro"))
      .select(col("doc_id"), col("n_terms"), col("score_micro"),
        round(col("score_micro").cast("double") / 1e6, 4).as("bm25"))
  }

  /** BM25 statistics TABLE for the incremental retrieval shape: one row
    * per term `(tok, df, 0, 0)` plus a single corpus row
    * `("", 0, dl_total, n_docs)` (tokens are never empty, so the sentinel
    * key cannot collide). A 100 TB corpus doesn't recompute df/avgdl per
    * query — it maintains this table and folds document batches in with
    * [[bm25MergeStats]]. All values are exact longs, so maintained ≡
    * recomputed is bit-equality, not approximation (`avgdl` is derived at
    * score time as dl_total / n_docs — exact-integer division to double,
    * immune to float-accumulation order). */
  def bm25Stats(docs: DataFrame): DataFrame = {
    val tf = graft.core.Caching.shared(termFreqs(docs))
    val terms = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .select(col("tok"), col("df"), lit(0L).as("dl_total"), lit(0L).as("n_docs"))
    val corpus = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      .agg(coalesce(sum("dl"), lit(0L)).as("dl_total"), count(lit(1)).as("n_docs"))
      .select(lit("").as("tok"), lit(0L).as("df"), col("dl_total"), col("n_docs"))
    terms.union(corpus)
  }

  /** Fold a new document batch into a maintained BM25 statistics table —
    * the [[Merge.upsert]] (x13) machinery, so the nightly batch is ONE
    * key join against the stats table (shuffle-free over a
    * [[graft.sources.BucketedStore]] layout), never a corpus re-scan.
    * Exact longs add exactly: applying batches in any order reaches the
    * same table as one full rebuild. */
  def bm25MergeStats(stats: DataFrame, batch: DataFrame): DataFrame = {
    val b = bm25Stats(batch)
    val incremented = b.join(stats.select(col("tok"),
        col("df").as("__odf"), col("dl_total").as("__odl"),
        col("n_docs").as("__ond")), Seq("tok"), "left")
      .select(col("tok"),
        (col("df") + coalesce(col("__odf"), lit(0L))).as("df"),
        (col("dl_total") + coalesce(col("__odl"), lit(0L))).as("dl_total"),
        (col("n_docs") + coalesce(col("__ond"), lit(0L))).as("n_docs"))
    Merge.upsert(stats, incremented, "tok",
      Seq("df", "dl_total", "n_docs")).drop("action")
  }

  /** BM25 scoring against a MAINTAINED statistics table ([[bm25Stats]] /
    * [[bm25MergeStats]]) instead of per-query corpus aggregates — same
    * integer-micro quantization discipline as [[bm25]], identical scores
    * when the table covers the corpus. Per-doc tf/dl come from the scored
    * docs themselves (intrinsic to the row); df and the 1-row corpus
    * stats are the only table lookups — a vocabulary-sized join and a
    * broadcast. */
  def bm25WithStats(docs: DataFrame, stats: DataFrame, queryTerms: Seq[String],
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val tf = graft.core.Caching.shared(termFreqs(docs))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val corpus = stats.filter(col("tok") === "").select(col("n_docs"),
      (col("dl_total").cast("double") / col("n_docs")).as("avgdl"))
    // prune the vocabulary-sized stats table to the query terms at the
    // scan — the df join is then a |q|-row broadcast, not a table join
    val dfreq = stats.filter(col("tok").isin(queryTerms: _*))
      .select(col("tok"), col("df"))
    tf.filter(col("tok").isin(queryTerms: _*))
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__term",
        col("__idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("__micro", floor(col("__term") * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("__micro").as("score_micro"))
      .select(col("doc_id"), col("n_terms"), col("score_micro"),
        round(col("score_micro").cast("double") / 1e6, 4).as("bm25"))
  }

  /** PII patterns shared with the oracle dialect — RE2-safe (no
    * lookaround, no backreferences), so the same strings run under Java
    * regex and DuckDB. Heuristic-detector shape, not a compliance tool. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Per-doc PII hit counts (emails, IPv4s, phone-shaped numbers) — the
    * detect side of a scrubbing pipeline. Pure regexp expressions fused
    * into the scan: no shuffle, no UDF. */
  def piiSignals(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(col(textCol), lit(ipRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(col(textCol), lit(phoneRe), lit(0))))

  /** Redact PII in place: emails → [EMAIL], IPv4s → [IP], phone-shaped
    * numbers → [PHONE]. Email runs first so its local-part digits can't be
    * half-eaten by the narrower patterns. A narrow per-row map at 100 TB. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")

  /** Concat-then-chunk sequence packing — the GPT-style training-data
    * layout: within each shard, documents are laid end to end in doc_id
    * order (one separator token after each doc) and the stream is cut into
    * fixed `seqLen`-token training sequences. Emits each doc's position:
    * its shard-stream offset, the first/last sequence index it lands in,
    * and how many sequences it spans.
    *
    * The window sum runs per shard, so parallelism scales with shard
    * count, not corpus size — the shard column (a source/file/split key)
    * is what bounds any single sort at 100 TB. Deterministic: no RNG,
    * replayable, append-stable within a shard. */
  def packSequences(docs: DataFrame, seqLen: Int,
                    shardCol: String = "source"): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col(shardCol).as("shard"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tokens") + 1).over(w), lit(0L)))
      .withColumn("first_seq", floor(col("tok_offset") / seqLen))
      // the doc occupies [tok_offset, tok_offset + n_tokens] inclusive of
      // its trailing separator token
      .withColumn("last_seq", floor((col("tok_offset") + col("n_tokens")) / seqLen))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }

  /** Per-domain corpus aggregate — the C4-style domain-level quality/dedup
    * profile used to build domain allow/block lists: doc count, mean
    * quality, mean token count, and the share of docs whose exact text
    * appears more than once corpus-wide.
    *
    * Cross-engine note: the means sum exact values (quality as
    * decimal(18,4), tokens as longs) and divide ONCE in double — float
    * accumulation order never varies the result, unlike avg() over
    * doubles. Both aggregates are map-side combined; the digest join keys
    * 32-byte hashes, never documents. */
  def domainStats(docs: DataFrame, domainCol: String = "source"): DataFrame = {
    val scored = withQuality(docs).select(col(domainCol).as("domain"),
      col("quality").cast("decimal(18,4)").as("q"),
      tokenCount(col("text")).cast("long").as("nt"),
      // internal-only copy-census key: 16-byte binary, not 32-hex chars
      // (unhex injective on md5 — round 20, guide §2.3 narrower types)
      unhex(md5(col("text"))).as("digest"))
    val copies = scored.groupBy("digest").agg(count(lit(1)).as("nc"))
    scored.join(copies, "digest")
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("q")).cast("double") / count(lit(1)), 4).as("mean_quality"),
        round(sum(col("nt")).cast("double") / count(lit(1)), 2).as("mean_tokens"),
        round(sum(when(col("nc") > 1, 1.0).otherwise(0.0)) / count(lit(1)), 4)
          .as("dup_frac"))
  }

  /** Order-sensitive document fingerprint: positionally-weighted sum of
    * portable token hashes mod p — a rolling-hash-class fingerprint that
    * both Spark and the DuckDB oracle can compute exactly.
    * fp = Σ h(tokᵢ)·(2i+1) mod p. */
  def fingerprint(text: Column): Column =
    // one primitive kernel call per document (TextKernels.TokenFingerprint,
    // round 16): per non-empty token, one MD5 + one fused multiply-add-mod
    // in a JIT'd loop, position counting kept tokens exactly like the old
    // filter→sequence→zip_with→aggregate HOF chain did — which ran
    // interpreted per token and was 3.7× under-measured under the old
    // count() bench action. Bit-identical (TextKernelsSpec), including the
    // null result for docs with no tokens.
    graft.functions.TextKernels.fingerprint(split(lower(text), "\\s+"))

  /** Bigram-LM surprisal — the CCNet-class perplexity filter: score each
    * document by the mean negative log-likelihood of its token bigrams
    * under a corpus-trained bigram model with add-one smoothing,
    * P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V). High scores flag word salad
    * and boilerplate the unigram model ([[unigramSurprisal]]) cannot see
    * (it is ORDER-BLIND; this is the cheapest order-aware LM proxy).
    *
    * Same exactness discipline as t15: each bigram's −ln p is quantized to
    * integer micro-nats BEFORE the per-doc mean, so the aggregate is exact
    * integer arithmetic and hash-comparable across engines. Shuffle
    * currency: the bigram relation (doc_id + two tokens/row) for the count
    * and probe joins — the same exchange class tfidf pays. The model
    * tables (bigram counts, prefix counts) are vocabulary-sized: bfreq is
    * persisted because the prefix aggregate AND the probe join both read
    * it; prefix counts derive from bfreq, never a second corpus pass. */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= 2)
    val bi = toks.select(col("doc_id"), explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bfreq = graft.core.Caching.shared(
      bi.groupBy("w1", "w2").agg(count(lit(1)).as("__bc")))
    val pfx = bfreq.groupBy("w1").agg(sum("__bc").as("__pc"))
    val vocab = docs
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .agg(countDistinct("tok").as("__v"))
    bi
      .join(bfreq, Seq("w1", "w2"))
      .join(pfx, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("__micro",
        floor(-log((col("__bc") + lit(1.0)) / (col("__pc") + col("__v"))) * 1e6 + 0.5)
          .cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("__micro").as("__sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__sum").cast("double") / col("n_bigrams") / 1e6, 4).as("surprisal"))
  }

  /** CCNet-style language-model perplexity gate (Wenzek et al., LREC'20)
    * — the canonical LM quality filter: each document scored by its
    * perplexity under an interpolated unigram/bigram model trained on the
    * corpus itself, p(w₂|w₁) = λ·(bc/pc) + (1−λ)·(uc+1)/(N+V), and gated
    * at a surprisal budget of `tauMicro` micro-nats per bigram (default
    * 3.5 nats ≈ ppl 33, mid-corpus on the test distribution). λ = 0.75
    * deliberately: both λ and 1−λ are exact binary doubles, so the
    * interpolation replays bit-for-bit on any engine (0.7/0.3 would not).
    * The keep decision compares INTEGER micro-nat sums (Σmicro <
    * n·tauMicro) — no float threshold boundary exists; `ppl` is the
    * rounded human diagnostic. Documents with fewer than two tokens have
    * no bigrams and are absent (a deployment gates those on [[tokenStats]]
    * length rules instead).
    *
    * Scale shape: the token-array scan is pinned and feeds the unigram
    * census, the bigram census, and the scoring explode; all model
    * relations are vocabulary-sized; totals ride as a 1-row broadcast —
    * the t15/t17/t34 discipline unchanged. */
  def perplexityFilter(docs: DataFrame, tauMicro: Long = 3500000L): DataFrame = {
    val lambda = 0.75
    val tokl = graft.core.Caching.shared(
      docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__toks")))
    val uc = graft.core.Caching.shared(
      tokl.select(explode(col("__toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("__uc")))
    val tot = uc.agg(sum("__uc").as("__n"), count(lit(1)).as("__v"))
    val bi = tokl.filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bfreq = graft.core.Caching.shared(
      bi.groupBy("w1", "w2").agg(count(lit(1)).as("__bc")))
    val pfx = bfreq.groupBy("w1").agg(sum("__bc").as("__pc"))
    bi.join(bfreq, Seq("w1", "w2"))
      .join(pfx, "w1")
      .join(uc.withColumnRenamed("tok", "w2"), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("__micro", floor(-log(
          lit(lambda) * (col("__bc").cast("double") / col("__pc")) +
          lit(1.0 - lambda) * ((col("__uc") + 1).cast("double") / (col("__n") + col("__v"))))
        * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("__micro").as("__sum"))
      .select(col("doc_id"), col("n_bigrams"),
        round(exp(col("__sum").cast("double") / col("n_bigrams") / 1e6) + lit(5e-7), 2)
          .as("ppl"),
        (col("__sum") < col("n_bigrams") * tauMicro).cast("int").as("keep"))
  }

  /** PMI collocation ranking — the classic bigram-association extractor
    * (Church & Hanks 1990): PMI(w1,w2) = ln(p(w1,w2) / (p(w1)·p(w2))) with
    * p from corpus counts, so the argument is the exact integer rational
    * c12·N² / (M·c1·c2) (N tokens, M bigrams). Scores are micro-nat
    * quantized ([[unigramSurprisal]]'s cross-engine recipe) and ranked
    * with a total (score, w1, w2) tiebreak. `minCount` drops the hapax
    * noise floor BEFORE the vocabulary joins — at 100 TB most bigrams are
    * singletons and never deserve a join probe. Shuffle currency: one
    * bigram aggregate + two vocabulary-keyed hash joins; the totals are
    * 1-row broadcasts. The unigram-count and bigram-count relations are
    * pinned (each feeds two consumers) — caller releases. */
  def collocations(docs: DataFrame, minCount: Long = 5, topK: Int = 20): DataFrame = {
    val tokl = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
    val uni = tokl.select(explode(col("toks")).as("tok"))
    val uc = graft.core.Caching.shared(
      uni.groupBy("tok").agg(count(lit(1)).as("c")))
    // totals derive from the pinned count relations — the corpus explodes
    // exactly twice (unigrams, bigrams), never again for a scalar
    val n = uc.agg(sum("c").as("__n"))
    val bcAll = graft.core.Caching.shared(
      tokl.filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .agg(count(lit(1)).as("c12")))
    val m = bcAll.agg(sum("c12").as("__m"))
    bcAll.filter(col("c12") >= minCount)
      .join(uc.select(col("tok").as("w1"), col("c").as("__c1")), "w1")
      .join(uc.select(col("tok").as("w2"), col("c").as("__c2")), "w2")
      .crossJoin(broadcast(n)).crossJoin(broadcast(m))
      .withColumn("pmi_micro",
        floor(log((col("c12") * col("__n") * col("__n")).cast("double") /
          (col("__m") * col("__c1") * col("__c2")).cast("double")) * 1e6 + 0.5)
          .cast("long"))
      .select(col("w1"), col("w2"), col("c12"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Inverted index: token → document frequency + the sorted posting list
    * (retrieval-side complement of tfidf; also the exact-match layer of a
    * decontamination service). One explode + one hash aggregate — the same
    * shuffle tfidf already pays, nothing quadratic. Postings are rendered
    * as a comma-joined string in NUMERIC doc order so the row is directly
    * hash-comparable across engines; `minDf` prunes the hapax tail, which
    * at 100 TB is most of the vocabulary (drop it before it shuffles:
    * the filter runs on the aggregate OUTPUT, partials combine map-side).
    * A production variant would cap posting length for stop-words; the cap
    * belongs to the caller (compose with a HAVING-style filter on df). */
  def invertedIndex(docs: DataFrame, minDf: Int = 1): DataFrame =
    docs
      .select(col("doc_id"),
        explode(array_distinct(Dedup.tokens(col("text")))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf)

  /** Misra-Gries frequency summary: at most `k` counters; any term with
    * true frequency > N/(k+1) is guaranteed present, with estimate
    * undercounting by at most N/(k+1). Mergeable (Agarwal et al.,
    * "Mergeable Summaries"): merged summaries keep the same guarantee, so
    * partials combine across partitions like any algebraic aggregate —
    * the property that makes the sketch a constant-size substitute for a
    * vocabulary-wide shuffle at corpus scale. */
  class MisraGries(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(m: Map[String, Long], term: String): Map[String, Long] =
      m.get(term) match {
        case Some(c) => m.updated(term, c + 1)
        case None if m.size < k => m.updated(term, 1L)
        // all counters decrement; zeros evict (the classic MG step)
        case None => m.collect { case (t, c) if c > 1 => t -> (c - 1) }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val s =
        if (a.size >= b.size) b.foldLeft(a) { case (m, (t, c)) =>
          m.updated(t, m.getOrElse(t, 0L) + c) }
        else merge(b, a)
      if (s.size <= k) s
      else {
        // subtract the (k+1)-th largest count from all; drop non-positive
        val cut = s.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)(k)
        s.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }
    def finish(m: Map[String, Long]): Map[String, Long] = m
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact corpus heavy hitters (frequency ≥ N/`support`) by the two-pass
    * sketch discipline: pass 1 folds a [[MisraGries]] summary with
    * 2·support counters — constant-size state per partition, merged on
    * the driver like a Bloom build, NEVER a vocabulary-sized shuffle —
    * whose guarantee (present if freq > N/(2s+1) < N/s) makes the
    * candidate set a certain superset of the answer; pass 2 counts the
    * candidates exactly (the `isin` filter prunes at the scan, so the
    * aggregate shuffles ≤ 2·support distinct keys) and keeps
    * cnt·support ≥ N. At 100 TB this is the only shape that finds top
    * terms without materializing the long-tail vocabulary. */
  def heavyHitters(docs: DataFrame, support: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = graft.core.Caching.shared(
      docs.select(explode(Dedup.tokens(col("text"))).as("term")))
    val summary = terms.as[String]
      .select(new MisraGries(2 * support).toColumn).head()
    val total = terms.count()
    val cands = summary.keys.toSeq.sorted
    terms.filter(col("term").isin(cands: _*))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * support >= total)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("term").asc)).cast("int"))
      .orderBy("rank")
  }

  /** Canonical text normalization — the preprocessing pass every corpus
    * pipeline runs before hashing/dedup (C4/CCNet shape): lowercase,
    * strip everything outside [a-z0-9 ] (accents/punctuation/control
    * chars drop — a full NFKC pass would need a custom Expression; the
    * ASCII-canonical form is the portable, oracle-replayable core),
    * collapse whitespace runs to one space, trim. Pure regexp chain fused
    * into the scan — no UDF, no shuffle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Gopher-style hard quality rules as individually-actionable flags
    * (Rae et al. 2021 §A1.1 shape): token-count bounds, mean-word-length
    * bounds, symbol-to-word ratio, minimum stopword evidence. All integer
    * comparisons on counts bound ONCE as attributes (the [[withQuality]]
    * discipline — higher-order-function counts are excluded from
    * subexpression elimination, so each regex runs once per row, fused
    * into the scan; no shuffle, no UDF). `keep` is the conjunction. */
  def gopherRules(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumns(Map(
        "__ntok" -> tokenCount(t).cast("long"),
        "__nchars" -> length(t).cast("long"),
        "__nstop" -> stopwordHits(t, stopwords("en")).cast("long"),
        "__nsym" -> size(regexp_extract_all(t, lit("[#@<>\\[\\]{}|\\\\]"), lit(0)))
          .cast("long")))
      .select(col("doc_id"),
        (col("__ntok") >= 50 && col("__ntok") <= 100000).cast("int").as("ok_n_tokens"),
        // mean word length in [3,10]: nchars/ntok bounds without the float
        (col("__nchars") >= col("__ntok") * 3 &&
          col("__nchars") <= col("__ntok") * 10).cast("int").as("ok_word_len"),
        // symbol-to-word ratio ≤ 0.1
        (col("__nsym") * 10 <= col("__ntok")).cast("int").as("ok_symbols"),
        (col("__nstop") >= 2).cast("int").as("ok_stopwords"))
      .withColumn("keep",
        (col("ok_n_tokens") * col("ok_word_len") *
          col("ok_symbols") * col("ok_stopwords")).cast("int"))
  }

  /** Sparse vector-space retrieval: rank the corpus against one document's
    * TF-IDF vector by sparse dot product over the shared-term posting
    * join — the classic VSM scorer next to [[bm25]] (data selection by
    * similarity-to-seed-corpus, the DSIR shape, runs exactly this with
    * the query side being the target-distribution centroid).
    *
    * Exactness discipline (the [[bm25]] pattern): idf quantizes to
    * integer micro-units per TERM (a vocabulary-sized scalar projection),
    * weights are tf·idf_micro integers, and the per-doc dot product is an
    * order-independent integer sum — no float ever accumulates.
    *
    * Scale shape: the (doc, term, tf) relation every text op shuffles is
    * pinned once and feeds df AND both weight legs; the query vector is
    * |q-terms| rows, broadcast; scoring touches only docs sharing ≥ 1
    * query term (the posting-list prune); top-k is TakeOrdered, never a
    * global sort. */
  def sparseRetrieval(docs: DataFrame, queryDocId: Long, k: Int = 20): DataFrame = {
    val tf = graft.core.Caching.shared(termFreqs(docs))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count_distinct(col("doc_id")).as("n_docs"))
    val w = graft.core.Caching.shared(
      tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("__idf_micro",
          floor((log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)
            * 1e6 + 0.5).cast("long"))
        .select(col("doc_id"), col("tok"), (col("tf") * col("__idf_micro")).as("w")))
    val qv = broadcast(w.filter(col("doc_id") === queryDocId)
      .select(col("tok"), col("w").as("__wq")))
    w.filter(col("doc_id") =!= queryDocId)
      .join(qv, "tok")
      .groupBy("doc_id")
      .agg(sum(col("w") * col("__wq")).as("score_micro2"))
      .orderBy(col("score_micro2").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro2").desc, col("doc_id").asc)).cast("int"))
  }

  /** Hashing-trick vectorizer (feature hashing): tokens bucket into a
    * fixed `dim`-slot index space via the portable 32-bit hash — the
    * vocabulary-free featurization that needs NO fitted dictionary, no
    * vocabulary shuffle, and no driver state, which is why it is the
    * text-to-features shape that survives 100 TB (a fitted CountVectorizer
    * is a vocabulary-sized broadcast that grows with the corpus; this is
    * O(dim) forever). Output is the sparse triplet form (doc_id, idx,
    * cnt) — one map-side-combined aggregate; collisions fold counts
    * (the standard hashing-trick tradeoff, dialed by `dim`). */
  def featureHash(docs: DataFrame, dim: Int = 64): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    // per-doc kernel tf (no exchange — see termFreqs) so the md5-affine
    // portable hash prices once per distinct term per doc, not once per
    // occurrence (same discipline as Sketch.countMin); collision folding
    // is unchanged — Σ over occurrences of bucket increments = Σ over
    // terms of tf
    termFreqs(docs)
      .select(col("doc_id"),
        (graft.functions.PortableHash.hash32(col("tok")) % dim).as("idx"),
        col("tf").as("__w"))
      .groupBy("doc_id", "idx")
      .agg(sum("__w").as("cnt"))
  }
}

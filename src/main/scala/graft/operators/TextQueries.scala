package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._

/** Query-shaped entry points for the text-analysis functions over the
  * `documents` table. All per-row expression work — no shuffle except where
  * a final group-by is part of the query shape. */
object TextQueries {

  /** Per-document stats: token counts (exact + BPE estimate), punctuation
    * ratio, stopword ratio, composite quality score. */
  def textStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      bpeTokenEstimate(col("text")).as("bpe_est"),
      punctRatio(col("text")).as("punct_ratio"),
      stopwordRatio(col("text")).as("stop_ratio"),
      qualityScore(col("text")).as("quality"))

  /** Language-ID confusion counts: declared lang × predicted lang. */
  def langIdConfusion(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), langId(col("text")).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  /** Rolling-hash document fingerprints. */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Gopher-style repetition/quality signals (Rae et al. 2021 §A1.1),
    * adapted to this corpus's newline-free text: per-document mean word
    * length, type-token ratio, most-common-word fraction, and duplicate
    * 2-gram fraction, plus the composite keep flag. Pure per-row array
    * expression work — zero shuffle, scales embarrassingly: each document
    * is scored independently of the corpus. The O(distinct·n) top-word
    * scan is bounded by document length (fine for page-sized docs; a
    * 100 TB run with book-sized docs would switch that one signal to the
    * explode→count formulation). */
  def gopherQuality(s: SparkSession, d: String): DataFrame = {
    val ws = expr("filter(split(text, ' '), x -> x != '')")
    val mwl = col("char_sum") / col("n_words")
    val d2f = lit(1.0) -
      col("d2") / when(col("n_words") > 1, col("n_words") - 1)
    Tables.documents(s, d)
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 1) // ANSI: no /0 on degenerate empty docs
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        expr("aggregate(ws, 0L, (a, w) -> a + length(w))").as("char_sum"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        expr("array_max(transform(array_distinct(ws), " +
          "w -> size(filter(ws, x -> x = w))))").as("top_cnt"),
        expr("CASE WHEN size(ws) > 1 THEN " +
          "size(array_distinct(transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))))) " +
          "ELSE 0 END").as("d2"))
      .select(col("doc_id"), col("n_words"),
        round(mwl, 4).as("mean_word_len"),
        round(col("n_distinct") / col("n_words"), 4).as("ttr"),
        round(col("top_cnt") / col("n_words"), 4).as("top_word_frac"),
        round(d2f, 4).as("dup_2gram_frac"),
        (col("n_words") >= 30 && mwl >= 2.0 && mwl <= 10.0 &&
          col("top_cnt") / col("n_words") <= 0.2 && d2f <= 0.6)
          .as("keep"))
  }

  /** PII detection + redaction (regex scrubbing — the standard pretraining
    * privacy pass). The corpus tables carry no natural PII, so the query
    * synthesizes a deterministic contact string from customer fields (the
    * oracle builds the identical string) and then runs the real operator:
    * count emails/phones via regexp_extract_all, mask them via
    * regexp_replace. Pure per-row regex work — codegen'd, zero shuffle,
    * embarrassingly parallel at any scale. */
  def piiRedact(s: SparkSession, d: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "555-[0-9]{4}-[0-9]{4}"
    val text = concat(
      lit("reach "), col("c_name"),
      when(col("c_custkey") % 3 === 0,
        concat(lit(" at user"), col("c_custkey"),
          lit("@mail.example.com"))).otherwise(lit("")),
      when(col("c_custkey") % 4 === 0,
        concat(lit(" call 555-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
          lit("-"),
          lpad(col("c_nationkey").cast("string"), 4, "0")))
        .otherwise(lit("")),
      lit(" end"))
    Tables.customer(s, d)
      .select(col("c_custkey"), text.as("text"))
      .select(col("c_custkey"),
        size(regexp_extract_all(col("text"), lit(email), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phone), lit(0)))
          .as("n_phones"),
        regexp_replace(regexp_replace(col("text"), email, "[EMAIL]"),
          phone, "[PHONE]").as("redacted"))
  }

  /** BM25 ranking (Robertson/Okapi, k1=1.2 b=0.75) for a fixed query-term
    * set. Scale shape: per-document term frequencies are array-filter
    * counts computed in the scan projection (no posting-list explode), and
    * the corpus statistics (N, avgdl, per-term document frequencies) are
    * ONE extra aggregate broadcast back as a single row — two passes over
    * the corpus total, no shuffle proportional to tokens. */
  def bm25(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("spark", "table", "join")
    val (k1, b) = (1.2, 0.75)
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .select(Seq(col("doc_id"), size(col("ws")).as("dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          expr(s"size(filter(ws, x -> x = '$t'))").as(s"tf$i")
        }: _*)
    val statCols =
      Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).as(s"df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val scored = base.join(broadcast(stats))
    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      idf * (col(s"tf$i") * (k1 + 1.0)) /
        (col(s"tf$i") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored
      .filter(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col("doc_id"), col("dl"),
        col("tf0"), col("tf1"), col("tf2"),
        round(score, 4).as("bm25"))
  }

  /** Inverted-index construction: term → document frequency + sorted
    * posting list. One explode of per-document DISTINCT terms (so the
    * shuffle carries |doc|·|vocab-per-doc| slim pairs, not token
    * multiplicity), one aggregation. Posting lists ship as sorted
    * comma-joined strings for engine-independent comparison; at 100 TB the
    * same plan emits array<bigint> postings partitioned by term. */
  def invertedIndex(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("array_distinct(filter(split(text, ' '), " +
          "x -> x != ''))")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", sort_array(collect_list(col("doc_id"))))
          .as("postings"))

  /** Shannon character entropy per document — the compressibility/quality
    * signal (gibberish and boilerplate both show up as entropy outliers).
    * Per-row array expression work only; the per-character term list is
    * SORTED before summation so the float fold order is engine-independent
    * (unordered summation would break the cross-engine hash). */
  def charEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        expr("array_sort(array_distinct(split(text, '')))").as("cs"),
        expr("split(text, '')").as("ch"))
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        size(col("cs")).as("n_distinct_chars"),
        round(-expr(
          "aggregate(transform(cs, c -> " +
            "(size(filter(ch, x -> x = c)) / cast(length(text) as double)) * " +
            "log2(size(filter(ch, x -> x = c)) / cast(length(text) as double))), " +
            "cast(0 as double), (a, x) -> a + x)"), 4).as("entropy"))

  /** Exact heavy hitters via a two-pass sketch-then-verify pipeline:
    * pass 1 runs the custom Misra-Gries aggregate (graft.functions
    * .MisraGries, ≤k-entry mergeable summary per mapper — shuffle cost
    * independent of corpus size) whose candidate set provably contains
    * every item with frequency > n/(k+1); pass 2 exact-counts ONLY the
    * candidates (broadcast semi join) and applies the real threshold.
    * Result is exactly the true heavy hitters — which is why a plain
    * exact GROUP BY oracle can check it — but at 100 TB the wide
    * aggregation runs over ~k items instead of the full vocabulary. */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import graft.functions.AggregateKernels.misraGries
    val toks = Tables.documents(s, d)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')"))
        .as("word"))
    val sketch = toks.agg(
      misraGries(col("word"), 200).as("mg"), count(lit(1)).as("n"))
    val cands = sketch.select(col("n"), explode(col("mg")).as("e"))
      .select(col("n"), col("e").getField("item").as("word"))
    toks.join(broadcast(cands.select(col("word"))), Seq("word"), "left_semi")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(sketch.select(col("n"))))
      .filter(col("cnt") > col("n") * 0.01)
      .select(col("word"), col("cnt"),
        round(col("cnt") / col("n").cast("double"), 4).as("frac"))
  }

  /** Corpus-duplicated span detection (the C4 three-sentence-span dedup
    * re-expressed for span = word 5-gram): a span is "duplicated" when it
    * occurs in ≥2 distinct documents; each document reports what fraction
    * of its spans are corpus duplicates. Shuffle shape at 100 TB: one
    * explode to slim (doc_id, gram) pairs, one count-distinct aggregation
    * per gram, one broadcast-unfriendly but partial-aggregated join back —
    * gram strings would become 64-bit hashes at scale (collision-tolerable
    * for a fraction estimate), which removes the wide string shuffle. */
  def dupSpans(s: SparkSession, d: String): DataFrame = {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(ws) - 4), " +
          "i -> concat_ws(' ', slice(ws, i, 5)))")).as("g"))
    val dup = grams.groupBy(col("g"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("g"), lit(1).as("isdup"))
    grams.join(dup, Seq("g"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("isdup"), lit(0))).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        round(col("n_dup") / col("n_grams"), 4).as("dup_frac"))
  }

  /** Corpus-trained bigram language model scoring each document in
    * bits-per-bigram — the CCNet/Gopher "LM perplexity as a quality
    * signal" idea with the LM trained ON the corpus itself (no external
    * model), add-one smoothed: P(w2|w1) = (c(w1,w2)+1) / (c(w1)+|V|).
    *
    * Shuffle shape at 100 TB: bigram counts are ONE partial-aggregated
    * groupBy over the exploded bigrams; context counts derive from the
    * bigram table (no second corpus pass); per-doc scoring first collapses
    * each doc's repeated bigrams to (doc, w1, w2, k) — the join against
    * the count tables then moves distinct-bigrams-per-doc rows, not every
    * token. The weighted average sum(k·nll)/sum(k) is computed with the
    * SAME grouping in the oracle, keeping float summation shapes aligned. */
  def bigramLm(s: SparkSession, d: String): DataFrame = {
    val bigf = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> named_struct('w1', a, 'w2', b))")).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    // pin the per-doc bigram counts: every downstream relation (global
    // bigram counts, unigram marginals, vocabulary, the scoring join)
    // derives from dbg, so without the checkpoint the tokenize+explode
    // scan would re-run once per branch (~4 full passes at bench scale)
    val dbg = bigf.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint()
    val cnt = dbg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("k")).as("c12"))
    val uni = cnt.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    // distinct w2 over dbg ≡ distinct w2 over the raw bigram stream
    val voc = dbg.agg(count_distinct(col("w2")).as("v"))
    dbg.join(cnt, Seq("w1", "w2")).join(uni, Seq("w1"))
      .crossJoin(broadcast(voc))
      .select(col("doc_id"), col("k"),
        (-log2((col("c12") + 1.0) / (col("c1") + col("v")))).as("nll"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("k") * col("nll")) / sum(col("k")), 4)
        .as("bits_per_bigram"),
        sum(col("k")).as("n_bigrams"))
  }

  /** Intra-document repetition removal — the within-doc counterpart of the
    * corpus-level dedup family (q24–q28): token-level keep-first dedup and
    * consecutive-duplicate detection, entirely inside the scan projection
    * (array HOFs, zero shuffles, codegen-friendly — the per-document shape
    * that holds at any corpus size because rows never interact).
    * `array_distinct` preserves FIRST-OCCURRENCE order in Spark; the
    * oracle reconstructs that order positionally (min(pos) per token)
    * since DuckDB's `list_distinct` order is unspecified. */
  def repetitionRemoval(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("w"))
      .select(col("doc_id"),
        size(col("w")).as("n_words"),
        size(array_distinct(col("w"))).as("n_distinct"),
        // transform's index is 0-based, element_at 1-based ⇒
        // element_at(w, i) IS the previous token; IF guards i = 0 lazily
        expr("aggregate(transform(w, (x, i) -> " +
          "IF(i > 0 AND x = element_at(w, i), 1, 0)), 0, (a, b) -> a + b)")
          .as("n_consec_dups"),
        array_join(slice(array_distinct(col("w")), 1, 10), " ")
          .as("dedup_prefix"))

  /** Temperature-weighted source mixture sampling to a token budget — the
    * corpus-composition step of a pretraining pipeline: source s gets
    * target share ∝ √tokens_s (temperature 0.5 up-weights small sources;
    * sqrt is correctly-rounded IEEE, hence bit-identical cross-engine),
    * scaled to half the corpus' total tokens, and docs are kept by the
    * deterministic md5 draw (q63/q101's idiom — reproducible sampling
    * with no RNG state, which is what makes re-runs and the oracle
    * agree). Acceptance rates round to 7 decimals on both engines so the
    * (tiny, summation-order-sensitive) Σ√ tail noise can't flip a draw.
    * Scale shape: per-source stats are a broadcast dimension; the kept
    * set is decided in the scan projection — one shuffle for the final
    * per-source rollup. */
  def mixtureSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(expr("filter(split(text, ' '), x -> x != '')"))
          .cast("long").as("toks"))
    val bySrc = docs.groupBy(col("source"))
      .agg(sum(col("toks")).as("src_toks"))
    val tot = bySrc.agg(sum(col("src_toks")).as("total"),
      sum(sqrt(col("src_toks").cast("double"))).as("wsum"))
    val rates = bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("src_toks"),
        round(least(lit(1.0),
          lit(0.5) * col("total") * sqrt(col("src_toks").cast("double")) /
            col("wsum") / col("src_toks")), 7).as("rate"))
    docs.join(broadcast(rates), "source")
      .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 8))
      .withColumn("thresh", lower(lpad(hex(
        least(floor(col("rate") * lit(4294967296.0)), lit(4294967295.0))
          .cast("bigint")), 8, "0")))
      .filter(col("h") < col("thresh"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("toks")).as("toks_kept"),
        max(col("rate")).as("rate"))
  }

  /** EXACT frequent word-bigrams via Count-Min sketch-then-verify: one
    * distributed pass builds a mergeable CM sketch over xxhash64'd
    * bigrams (fixed memory regardless of vocabulary — the point of CM
    * next to q81's k-bounded Misra-Gries), the estimate thresholds the
    * DISTINCT key set (est ≥ true ⇒ a provable superset of the frequent
    * bigrams; hash collisions only inflate estimates, preserving the
    * superset), and an exact count over just the candidate sliver
    * restores exactness — so the result is oracle-checkable against a
    * plain GROUP BY ... HAVING. At 100 TB the full bigram stream is
    * never shuffled: only candidates (≈ the output size) reach the
    * exact aggregation. */
  def cmFrequentBigrams(s: SparkSession, d: String): DataFrame = {
    val bg = Tables.documents(s, d)
      .select(graft.functions.TextAnalysis.tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> concat(a, ' ', b))")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .localCheckpoint() // sketch pass + candidate pass + verify: one scan
    val cm = bg.stat.countMinSketch("h", 0.0001, 0.99, 42)
    val thresh = cm.totalCount() / 1000.0
    val bos = new java.io.ByteArrayOutputStream()
    cm.writeTo(bos)
    val cand = bg.select(col("tok"), col("h")).distinct()
      .filter(graft.functions.CountMinExpressions
        .estimateLong(col("h"), bos.toByteArray) >= thresh)
      .select(col("tok"))
    bg.join(broadcast(cand), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= thresh)
  }

  /** Words the BPE trainer may see — bounds the driver-side training set
    * by VOCABULARY, not corpus size (the scale contract of
    * [[graft.functions.Bpe]]). */
  val BpeVocabCap = 10000
  val BpeMerges = 40

  /** Corpus-trained BPE subword distribution: distributed word counts →
    * deterministic merge training on the capped vocabulary → distributed
    * re-encode. Encoding runs once per DISTINCT word (a typed map over
    * the vocabulary with the merge table broadcast), then a broadcast
    * join fans the splits back over the full token stream — the corpus
    * itself is never re-parsed per merge rule. Rows-only for the driver
    * (BPE is not SQL-expressible); the spec pins training to the
    * hand-derived classic fixture and encoding to losslessness. */
  def bpeTokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, d)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
        .as("word"))
    val wc = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // shared: train collect + distinct-word encode
    val top = wc.orderBy(col("c").desc, col("word")).limit(BpeVocabCap)
      .as[(String, Long)].collect().toSeq
    val merges = graft.functions.Bpe.train(top, BpeMerges)
    val bc = s.sparkContext.broadcast(merges)
    val encoded = wc.select(col("word")).as[String]
      .map(w => (w, graft.functions.Bpe.encode(w, bc.value)))
      .toDF("word", "subs")
    words.join(broadcast(encoded), Seq("word"))
      .select(explode(col("subs")).as("bpe_token"))
      .groupBy(col("bpe_token")).agg(count(lit(1)).as("n"))
  }

  /** Driver-checkable form of [[bpeTokens]]: BPE encoding must be
    * LOSSLESS — concatenating a word's subword tokens restores the word,
    * for every distinct word in the corpus. The vocabulary size is
    * oracle-reproducible (DuckDB counts the same distinct whitespace
    * tokens); the lossless counts collapse the tokenizer's core
    * invariant into values the driver can hash: n_lossless == n_words
    * and all_lossless == true, or the gate fails. Same distributed
    * shape as the histogram: train on the capped vocab at the driver,
    * broadcast merges, encode each DISTINCT word once. */
  def bpeLossless(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wc = Tables.documents(s, d)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // shared: train collect + distinct-word encode
    val top = wc.orderBy(col("c").desc, col("word")).limit(BpeVocabCap)
      .as[(String, Long)].collect().toSeq
    val merges = graft.functions.Bpe.train(top, BpeMerges)
    val bc = s.sparkContext.broadcast(merges)
    wc.select(col("word")).as[String]
      .map(w => (w, graft.functions.Bpe.encode(w, bc.value).mkString == w))
      .toDF("word", "ok")
      .agg(count(lit(1)).as("n_words"),
        sum(col("ok").cast("long")).cast("long").as("n_lossless"),
        (count(lit(1)) === sum(col("ok").cast("long")))
          .as("all_lossless"))
  }

  /** Compression-ratio quality signal per source: DEFLATE bytes / chars
    * via the native [[graft.functions.DeflateSize]] codegen expression —
    * highly compressible documents are templated/repetitive, the signal
    * most public corpus-cleaning recipes pair with the Gopher rules
    * (q75). The whole computation lives in the scan projection; one
    * shuffle for the per-source rollup. Rows-only for the driver (no
    * DEFLATE in DuckDB); the spec pins the signal's discriminative
    * behavior on crafted fixtures. */
  def compressionSignal(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        graft.functions.CompressionExpressions.deflateSize(col("text"))
          .cast("long").as("z"),
        length(col("text")).cast("long").as("len"))
      .withColumn("ratio", col("z").cast("double") / col("len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("ratio")), 4).as("avg_ratio"),
        round(min(col("ratio")), 4).as("min_ratio"),
        round(max(col("ratio")), 4).as("max_ratio"),
        count_if(col("ratio") < 0.35).as("n_repetitive"),
        // codec sanity rails, consumed by the q184 driver gate: output
        // is never empty and expansion is bounded by DEFLATE's
        // worst case AS A FUNCTION OF LENGTH — stored blocks cost ~5
        // bytes per 64 KB plus 6 bytes zlib framing, so a fixed
        // absolute bound breaks on incompressible docs past ~745 KB
        // while a RATIO bound breaks on short docs where per-stream
        // overhead dominates
        min(col("z")).as("min_z"),
        max(col("z") - col("len")).as("max_overhead"),
        max(col("z") - col("len") -
          (lit(6L) + lit(5L) * ((col("len") / 65535).cast("long") + 1L)))
          .as("max_over_bound"))

  /** Driver-checkable form of [[compressionSignal]] (q184): consumes
    * the PRODUCTION operator's output (so a regression in its ratio or
    * aggregation logic flips the gate — a from-scratch recompute here
    * would let the operator break unseen) and collapses the DEFLATE
    * invariants to a boolean — every output positive (a compressor
    * cannot emit zero bytes), expansion bounded by the LENGTH-AWARE
    * worst case (output ≤ input + 6 + 5·⌈len/64 KB⌉ bytes: stored-block
    * overhead per 64 KB plus the zlib header/trailer; a fixed absolute
    * bound breaks on large incompressible docs, a RATIO bound on short
    * docs where the fixed per-stream overhead dominates), and the
    * ratio rollup internally consistent. DuckDB has no DEFLATE, so the
    * sizes stay Spark-side; the oracle states the boolean as literal
    * true. */
  def compressionSignalCheck(s: SparkSession, d: String): DataFrame =
    compressionSignal(s, d)
      .select(col("source"), col("n_docs"),
        (col("min_z") > 0L && col("max_over_bound") <= 0L &&
          col("min_ratio") <= col("avg_ratio") &&
          col("avg_ratio") <= col("max_ratio") &&
          col("n_repetitive") <= col("n_docs")).as("ratios_ok"))

  /** Sparse TF-IDF cosine similarity with AllPairs-style prefix
    * pruning (Bayardo et al., WWW'07 shape): the dot product decomposes
    * over SHARED TERMS, but a naive postings self-join blows up
    * quadratically on high-df stopwords. Instead each unit-normalized
    * vector leaves its LOW-WEIGHT TAIL (cumulative squared mass
    * < 0.159) out of the inverted index — exactly the high-df/low-idf
    * terms that cause the df² blowup — and only indexed-term collisions
    * become candidate pairs. For unit vectors a non-colliding pair has
    * dot ≤ ‖a_tail‖+‖b_tail‖ < 0.798, safely below the 0.8 output
    * threshold even at 5dp rounding (cutoff 0.799995), so the pruning
    * is LOSSLESS: candidates are exactly rescored over their full
    * postings and the result matches the naive join bit-for-bit.
    * Weights reuse q42's tf·(ln((N+1)/(df+1))+1) formula ROUNDED to 4
    * before any norm or dot, so both engines fold identical quantized
    * values. At 100 TB the index join touches only discriminative
    * terms (df-bounded by construction), and the rescore is
    * |candidates|·|doc terms| — near-duplicate-bounded, not
    * vocabulary-bounded. */
  def sparseCosine(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    // wi: the 4dp weight as a SCALED LONG — every truth-affecting sum
    // below (norms, dots) accumulates exact integers, so accumulation
    // ORDER cannot move the 5dp-rounded cosine across the 0.8 output
    // threshold on either engine (the q242/q212 determinism idiom; a
    // double Σw² / Σwa·wb would carry engine-specific summation order
    // into a threshold compare)
    val w = tf.join(df, Seq("word")).crossJoin(broadcast(nd))
      .select(col("doc_id"), col("word"),
        round(col("tf") *
          (log((col("nd") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)),
          4).as("w"))
      .withColumn("wi", round(col("w") * 10000, 0).cast("long"))
      .localCheckpoint() // reused: norm pass, index build, both rescore sides
    // n2/dot accumulate as LONG: order-independent integers on the
    // whole-stage-codegen path (a DECIMAL(38) variant measured +65% on
    // the query). Overflow headroom: wi ≤ ~4e7 here, ≤400 distinct
    // terms/doc → Σwi² ≤ ~6e17, 15× under 2^63 — and this session
    // runs ANSI mode (Spark 4 default), so a pathological corpus
    // FAILS LOUDLY with ARITHMETIC_OVERFLOW, never a silent wrap. The
    // oracle accumulates in HUGEINT (128-bit, would not overflow) but
    // casts each sum to BIGINT, so DuckDB errors at the same 2^63
    // point rather than silently diverging. For corpora where
    // docs×tf² genuinely approach 2^63, swap the two sums to
    // decimal(19,0) operands on both engines.
    val nrm = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"),
        sum(col("wi") * col("wi")).as("n2"))
      .localCheckpoint() // reused: index build + both cosine denominators
    // prefix index: per doc, ascending-weight cumulative squared mass;
    // rows past 0.159 carry enough norm that every ≥0.8 pair collides
    val wCum = Window.partitionBy(col("doc_id"))
      .orderBy(col("u"), col("word"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // materialized once: both candidate-join sides read the index, and
    // without the pin each side re-runs the join + cumulative-mass
    // window (exchange reuse shares only the shuffle write, not the
    // window stage on top — guide §2.4; measured 4.26 → 3.51 s at sf0.1)
    val idx = w.join(nrm, Seq("doc_id"))
      .withColumn("u", col("w") / col("nrm"))
      .withColumn("cum", sum(col("u") * col("u")).over(wCum))
      .filter(col("cum") >= 0.159)
      .select(col("doc_id"), col("word"))
      .localCheckpoint()
    // distinct first (map-side partial dedup cuts the pair stream
    // before its shuffle), then a keyed re-spread to the cluster
    // parallelism: AQE coalesces the byte-small distinct output to 2-3
    // partitions, serializing the CPU-dense merge-walk verify below —
    // same fix as weightedJaccardPairsDf (explicit partition counts
    // are exempt from AQE coalescing)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val cand = idx.select(col("doc_id").as("doc_a"), col("word"))
      .join(idx.select(col("doc_id").as("doc_b"), col("word")),
        Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .repartition(par, col("doc_a"))
    // exact rescore: full-posting integer dot (Σ wiₐ·wi_b — the scale
    // factors cancel in the cosine: Σ(wiₐ·wi_b)/√(Σwiₐ²)√(Σwi_b²) =
    // Σ(wₐ·w_b)/(‖a‖‖b‖)) via the q134 sorted-array verify idiom
    // (round 14, guide §2.3): each doc packs its (word, wi) postings
    // ONCE into co-indexed sorted arrays; each candidate pair is one
    // zero-allocation codegen merge walk (SortedKeyDotSum, overflow →
    // loud Math.multiplyExact/addExact failure, same contract as the
    // ANSI integer sums it replaces). The previous shape — cand ⋈ w(a)
    // ⋈ w(b, word) + re-aggregate — materialized |cand| × |postings|
    // rows through a shuffle. wi ≥ 1 for every posting (w > 0 since
    // idf+1 ≥ 1 − log(N+1/df+1) can never reach −1), so dotl ≥ 1 ⟺ the
    // pair shares a word: the dotl > 0 filter keeps the old
    // inner-join-on-word semantics bit-for-bit. packed attaches
    // broadcast while it fits (size-gated on the checkpointed count) so
    // no array payload rides a shuffle (§8); past the gate the attach
    // degrades to shuffled joins.
    val packed = w.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("word"), col("wi"))))
        .as("p"))
      .join(nrm.select(col("doc_id"), col("n2")), Seq("doc_id"))
      .select(col("doc_id"),
        expr("transform(p, x -> x.word)").as("ks"),
        expr("transform(p, x -> x.wi)").as("vs"),
        col("n2"))
      .localCheckpoint() // both verify sides read it
    val bcastDocs = packed.count() <= 1000000L
    def side(alias: String, ks: String, vs: String, n2: String) = {
      val p0 = packed.select(col("doc_id").as(alias), col("ks").as(ks),
        col("vs").as(vs), col("n2").as(n2))
      if (bcastDocs) broadcast(p0) else p0
    }
    cand
      .join(side("doc_a", "ka", "va", "n2a"), Seq("doc_a"))
      .join(side("doc_b", "kb", "vb", "n2b"), Seq("doc_b"))
      .withColumn("dotl",
        graft.functions.SortedKeyWeightSum.sortedKeyDotSum(
          col("ka"), col("va"), col("kb"), col("vb")))
      .filter(col("dotl") > 0)
      .select(col("doc_a"), col("doc_b"),
        round(col("dotl").cast("double") /
          (sqrt(col("n2a").cast("double")) *
            sqrt(col("n2b").cast("double"))), 5).as("cos"))
      .filter(col("cos") >= 0.8)
  }

  /** Cross-document chunk-level deduplication (the C4/RefinedWeb
    * line-dedup shape at paragraph granularity): every document splits
    * into consecutive 20-token chunks, a chunk survives only at its
    * FIRST corpus occurrence (ordered by doc_id, then position), and the
    * per-source report shows how much of each source is boilerplate
    * repeated elsewhere. The first-occurrence pick is one window
    * row_number partitioned BY CHUNK TEXT — the only wide shuffle, keyed
    * on content, so at 100 TB it scales with distinct-chunk cardinality
    * and hot boilerplate chunks are single-key skew AQE splits.
    * Chunking itself is a scan-side lambda (sequence + slice inside the
    * projection — no join, no explode of single tokens). */
  def chunkDedup(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        graft.functions.TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
    val chunks = toks.select(col("doc_id"), col("source"),
        posexplode(expr(
          "transform(sequence(0, cast(ceil(size(t) / 20.0) as int) - 1)," +
            " i -> array_join(slice(t, i * 20 + 1, 20), ' '))")))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val first = chunks.withColumn("rn", row_number().over(
      Window.partitionBy(col("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))))
    first.groupBy(col("source"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        count_if(col("rn") === 1).as("n_kept"),
        round(count_if(col("rn") === 1) / count(lit(1)).cast("double"), 5)
          .as("pct_kept"))
  }

  /** Zipf's-law fit of the corpus token-frequency distribution: OLS of
    * log(freq) on log(rank) over the top-100 tokens — the standard
    * sanity signal that a scraped corpus has natural-language token
    * statistics (synthetic/templated text shows a flattened slope).
    * The token count is the only corpus-sized stage (one shuffle,
    * map-side combined); the top-100 ranking and the regression are
    * 100-row work. Determinism: ranks tie-break on token; ln values
    * quantize at 9dp BEFORE the product/square terms (last-ulp ln
    * differences can't reach the decimal cast), and every OLS moment
    * accumulates in DECIMAL(30,12) from 9dp-rounded terms — lossless
    * reconstruction, so the final few IEEE ops see identical inputs. */
  def zipfFit(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')"))
        .as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    // global top-100: orderBy+limit plans as TakeOrderedAndProject
    // (per-partition partial top-k, driver merge) — the rank window
    // then runs over 100 rows, never the vocabulary (a bare
    // row_number over all tokens would single-partition a
    // billions-distinct vocabulary at 100 TB)
    val top = counts
      .orderBy(col("freq").desc, col("tok")).limit(100)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("freq").desc, col("tok"))))
      .select(round(log(col("rk")), 9).as("x"),
        round(log(col("freq")), 9).as("y"))
    val dec = (c: Column) => c.cast("decimal(30,12)")
    val moments = top.agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).cast("double").as("sx"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum(dec(round(col("x") * col("x"), 9))).cast("double").as("sxx"),
      sum(dec(round(col("y") * col("y"), 9))).cast("double").as("syy"),
      sum(dec(round(col("x") * col("y"), 9))).cast("double").as("sxy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    moments
      .crossJoin(counts.agg(sum(col("freq")).as("total_tokens"),
        count(lit(1)).as("vocab")))
      .select(col("total_tokens"), col("vocab"), col("n"),
        round(covN / varX, 6).as("slope"),
        round((col("sy") - (covN / varX) * col("sx")) / col("n"), 6)
          .as("intercept"),
        round(covN * covN / (varX * varY), 6).as("r2"))
  }

  /** Heaps'-law vocabulary growth: cumulative vocabulary size vs
    * cumulative token count at ten corpus-prefix checkpoints (doc_id
    * deciles), plus the fitted growth exponent β from log-log OLS
    * (V ≈ K·N^β; natural corpora sit at β ≈ 0.4-0.6 — a saturating or
    * linear vocabulary is a template/boilerplate red flag). The heavy
    * stages are corpus-shaped: one token explode for per-doc counts and
    * one groupBy for token first-occurrence (both map-side combined);
    * the decile boundaries come from [[GlobalOrder]]'s range-
    * partitioned row number (never a global ntile window), and the
    * 10-point regression is constant-size.
    * Same determinism recipe as q215: integer counts, 9dp-quantized ln
    * terms, DECIMAL moment sums. */
  def heapsLaw(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .localCheckpoint() // token explode + per-doc counts share it
    // decile boundaries WITHOUT a global ntile window (which would
    // single-partition every document): GlobalOrder's range-partitioned
    // global row number + exact integer ntile arithmetic — the q122
    // idiom. doc_id is unique, so the order is total.
    val total = docs.select(col("doc_id")).agg(count(lit(1)).as("__n"))
    val bounds = GlobalOrder
      .rowNumber(docs.select(col("doc_id")), "rn", col("doc_id"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), GlobalOrder
        .ntileFromRowNumber(col("rn"), col("__n"), 10).cast("int")
        .as("dec"))
      .groupBy(col("dec"))
      .agg(max(col("doc_id")).as("hi"))
    val perDoc = docs.select(col("doc_id"), size(col("ws")).as("nw"))
    val nCum = perDoc.crossJoin(broadcast(bounds))
      .filter(col("doc_id") <= col("hi"))
      .groupBy(col("dec")).agg(sum(col("nw")).as("n_tokens_cum"))
    val firstSeen = docs
      .select(col("doc_id"), explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
    val vCum = firstSeen.crossJoin(broadcast(bounds))
      .filter(col("fd") <= col("hi"))
      .groupBy(col("dec")).agg(count(lit(1)).as("vocab_cum"))
    val pts = nCum.join(vCum, Seq("dec"))
      .select(col("dec"), col("n_tokens_cum"), col("vocab_cum"),
        round(log(col("n_tokens_cum")), 9).as("x"),
        round(log(col("vocab_cum")), 9).as("y"))
      .localCheckpoint() // 10 rows: points output + OLS moments
    val dc = (c: Column) => c.cast("decimal(30,12)")
    val fit = pts.agg(count(lit(1)).as("n"),
        sum(dc(col("x"))).cast("double").as("sx"),
        sum(dc(col("y"))).cast("double").as("sy"),
        sum(dc(round(col("x") * col("x"), 9))).cast("double").as("sxx"),
        sum(dc(round(col("x") * col("y"), 9))).cast("double").as("sxy"))
      .select(
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("beta"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx"))
          / col("n"), 6).as("log_k"))
    pts.select(col("dec").as("decile"), col("n_tokens_cum"),
        col("vocab_cum"))
      .crossJoin(broadcast(fit))
  }

  /** Unicode NFC normalization battery driving the native [[
    * graft.functions.NfcNormalize]] expression (scan-side projection,
    * whole-stage codegen — a UDF here would de-codegen the cleaning
    * path every multilingual corpus runs first). The corpus is ASCII,
    * so each row APPENDS canonically-decomposed sequences (base letter
    * + combining accent, built with chr() so the same construction runs
    * in DuckDB) and the battery checks composition against the
    * precomposed code points, char-length shrinkage, and idempotence —
    * all verified against DuckDB's independent nfc_normalize. */
  def unicodeNormalize(s: SparkSession, d: String): DataFrame = {
    // Spark's chr() is ASCII-only (mod 256), so the combining sequences
    // are Scala literals; the oracle builds the same code points with
    // DuckDB's codepoint-wide chr().
    val dec = concat(lower(col("p_name")),
      lit(" e\u0301a\u0308A\u030A")) // decomposed: base + combining accents
    val composed = concat(lower(col("p_name")),
      lit(" \u00E9\u00E4\u00C5")) // precomposed NFC forms
    Tables.part(s, d).select(col("p_partkey"), dec.as("dec"),
        composed.as("comp"))
      .select(col("p_partkey"),
        graft.functions.UnicodeExpressions.nfc(col("dec")).as("nfc_str"),
        length(col("dec")).as("len_raw"),
        length(graft.functions.UnicodeExpressions.nfc(col("dec")))
          .as("len_nfc"),
        (graft.functions.UnicodeExpressions.nfc(col("dec")) ===
          col("comp")).as("composed_ok"),
        (graft.functions.UnicodeExpressions.nfc(col("comp")) ===
          col("comp")).as("idempotent_ok"))
  }

  /** Skip-gram co-occurrence counts (window ≤ 2, the word2vec/GloVe
    * counting step): for every ordered-position pair (wᵢ, wⱼ) with
    * j − i ∈ {1, 2}, the pair count and the distance-weighted count
    * Σ 1/(j−i). Pair generation happens ENTIRELY inside the scan
    * projection — an array HOF builds both offsets' pairs per document
    * with zero joins (the positional self-join formulation shuffles the
    * token stream twice; this shape shuffles only the aggregated pair
    * counts). Distance weights are carried ×2 (2/dist ∈ {2,1}) so the
    * whole query is exact integer arithmetic; the /2.0 at the edge is
    * exactly representable. */
  def skipgramCooc(s: SparkSession, d: String, minCount: Long = 50L)
      : DataFrame =
    Tables.documents(s, d)
      .select(expr("filter(split(lower(text), ' '), x -> x != '')")
        .as("w"))
      .select(explode(expr(
        // for each position i (0-based), emit (w[i], w[i+1], dist 1)
        // and (w[i], w[i+2], dist 2); flatten drops the empty tails
        "flatten(transform(w, (x, i) -> " +
          "filter(array(" +
          "IF(i + 2 <= size(w), named_struct(" +
          "'a', x, 'b', element_at(w, i + 2), 'dist', 1), NULL), " +
          "IF(i + 3 <= size(w), named_struct(" +
          "'a', x, 'b', element_at(w, i + 3), 'dist', 2), NULL)), " +
          "p -> p IS NOT NULL)))")).as("p"))
      .groupBy(col("p.a").as("w_a"), col("p.b").as("w_b"))
      .agg(count(lit(1)).as("c"),
        sum(lit(2) / col("p.dist")).cast("long").as("wx2"))
      .filter(col("c") >= minCount)
      .select(col("w_a"), col("w_b"), col("c"),
        (col("wx2") / lit(2.0)).as("w"))

  /** Weighted-Jaccard (Ruzicka) near-dup pairs over term-frequency
    * vectors on the deterministic doc_id % 5 sample: J_w = Σ min(tfₐ,
    * tf_b) / Σ max(tfₐ, tf_b) — the dedup metric that sees REPEATED
    * tokens (plain Jaccard on token SETS scores a doc and its
    * double-concatenation identical; weighted Jaccard doesn't). The
    * denominator never materializes the token UNION: Σmax = Tₐ + T_b −
    * Σmin, so the only pair work is the intersection join. */
  def weightedJaccard(s: SparkSession, d: String,
      threshold: Double = 0.3): DataFrame =
    weightedJaccardPairsDf(
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text")), threshold)

  /** [[weightedJaccard]] over an arbitrary (doc_id, text) frame, with
    * LOSSLESS AllPairs-style prefix filtering (the weighted analogue of
    * q185's cosine index and q134's set-Jaccard index): a raw postings
    * self-join is df² in a hot token's document frequency — one
    * boilerplate stopword in every document makes the candidate join
    * quadratic in the corpus. Instead, tokens order globally by
    * (df asc, word) — rare first — and each document leaves its
    * HIGH-DF TAIL out of the inverted index as long as the tail's tf
    * mass stays strictly under β·T with β = t/(1+t).
    *
    * Why lossless: J_w ≥ t ⟺ Σmin ≥ t/(1+t)·(Tₐ+T_b). If a qualifying
    * pair shared no token indexed by BOTH docs, every shared token is
    * in a's excluded tail or b's excluded tail, so Σmin ≤ tailMass(a)
    * + tailMass(b) < β·Tₐ + β·T_b = t/(1+t)·(Tₐ+T_b) — contradiction.
    * Candidates rescore EXACTLY from the full tf postings, so output
    * is identical to the naive join. The threshold enters the prune as
    * the rational ⌊t·10⁴⌋/10⁴ ≤ t (floor, so the index only ever grows
    * — never loses a pair) and every prune compare is exact integer
    * arithmetic; the true double threshold applies at the output edge.
    *
    * At 100 TB: a stopword with df = N sorts hottest, so it indexes
    * only for documents that are MOSTLY that token (tail mass ≥ β·T) —
    * documents that genuinely match each other. Pair work scales with
    * corpus size × discriminative-term collisions, never df²
    * (ScaleProbe `weighted_jaccard_hot` plants a corpus-wide token and
    * holds the cost linear). */
  /** (doc_id, word, tf) term frequencies for [[weightedJaccardPairsDf]]
    * — exposed for the losslessness spec. */
  private[graft] def wjTf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      explode(expr("filter(split(lower(text), ' '), x -> x != '')"))
        .as("word"))
    .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))

  /** The prefix-filter inverted index over a [[wjTf]] frame: per doc,
    * tokens whose high-df tail (itself + all hotter tokens in the
    * global df-desc order) carries tf mass ≥ β·T with β = t/(1+t) —
    * the maximal tail strictly under β·T is safely excluded (see
    * [[weightedJaccardPairsDf]]'s proof). Exposed for the spec that
    * pins hot-token exclusion. */
  private[graft] def wjIndex(tf: DataFrame, threshold: Double)
      : DataFrame = {
    // the prune threshold quantizes to ⌊t·10⁴⌋/10⁴; below the quantum a
    // clamped tNum=1 would prune HARDER than requested, contradicting
    // the losslessness proof — sub-resolution thresholds fall back to
    // tNum = 0 (no pruning: cum·tDen ≥ 0 keeps every posting)
    val tNum = math.floor(threshold * 10000).toLong max 0L
    val tDen = 10000L
    val tot = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("t"))
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // cumulative tf mass from the HOT end of the canonical order: cum
    // at token w = mass of w plus every hotter token. Excluding w is
    // safe iff cum·(tDen+tNum) < tNum·T (strict) — i.e. the whole
    // tail from w down stays under β·T. cum is monotone along the
    // window, so the excluded set is a maximal high-df tail.
    val wCum = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").desc, col("word").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tf.join(dfreq, Seq("word")).join(tot, Seq("doc_id"))
      .withColumn("cum", sum(col("tf")).over(wCum))
      .filter(col("cum") * lit(tDen + tNum) >= col("t") * lit(tNum))
      .select(col("doc_id"), col("word"))
  }

  def weightedJaccardPairsDf(docs: DataFrame,
      threshold: Double = 0.3): DataFrame = {
    import graft.functions.SortedKeyWeightSum.sortedKeyMinSum
    val tf = wjTf(docs)
      .localCheckpoint() // index build + packed postings + totals
    // pinned: BOTH candidate-join sides read the index; without the pin
    // each side re-runs the df join + cumulative-mass window (exchange
    // reuse shares only the shuffle write, not the window stage on top)
    val idx = wjIndex(tf, threshold).localCheckpoint()
    // distinct FIRST (map-side partial dedup cuts the pair stream
    // before its shuffle — a keyed repartition below the distinct
    // measured 1-1.5 s slower for losing it), then a keyed re-spread:
    // AQE coalesces the byte-small distinct output to 2-3 partitions,
    // which would run the CPU-dense merge-walk verify on 2-3 cores
    // (measured 2.2 s vs 0.65 s spread). Explicit partition counts are
    // exempt from AQE coalescing; keying by doc_a skips the local sort
    // a round-robin repartition pays for determinism (guide §2.5).
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val cand = idx.select(col("doc_id").as("doc_a"), col("word"))
      .join(idx.select(col("doc_id").as("doc_b"), col("word")),
        Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .repartition(par, col("doc_a"))
    // exact rescore via the q134 sorted-array verify idiom (guide §2.3,
    // round-14): each doc packs its postings ONCE into co-indexed
    // (sorted words, tfs) arrays; each surviving pair is then one
    // zero-allocation merge walk (SortedKeyMinSum, whole-stage
    // codegen). The previous shape — candidates ⋈ tf(a) ⋈ tf(b, word)
    // with a re-aggregate — materialized |cand| × |postings| rows
    // through a shuffle (~100M at sf0.1 where the 0.3 threshold keeps
    // the candidate set near all-pairs; measured 4.2 s → 1.9 s).
    // Σmin and the totals are the same exact integers as before;
    // smin ≥ 1 ⟺ the pair shares a word, so the smin > 0 filter keeps
    // the old inner-join-on-word semantics bit-for-bit.
    val packed = tf.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("word"), col("tf"))))
        .as("p"), sum(col("tf")).as("t"))
      .select(col("doc_id"),
        expr("transform(p, x -> x.word)").as("ks"),
        expr("transform(p, x -> x.tf)").as("vs"),
        col("t"))
      .localCheckpoint() // both verify sides read it
    // packed attaches BROADCAST while it fits (size-gated on the
    // checkpointed count — a metadata read): a shuffle join here would
    // drag every pair row's array payload through the second join's
    // exchange (the §8 trap — heavy bytes moving twice). Past the gate
    // (a corpus too large to broadcast one row per doc) the joins fall
    // back to shuffled attaches — the arrays then ride one exchange
    // each, still strictly less data motion than the posting-explosion
    // rescore this replaced.
    val bcastDocs = packed.count() <= 1000000L
    def side(alias: String, ks: String, vs: String, t: String) = {
      val p0 = packed.select(col("doc_id").as(alias), col("ks").as(ks),
        col("vs").as(vs), col("t").as(t))
      if (bcastDocs) broadcast(p0) else p0
    }
    cand
      .join(side("doc_a", "ka", "va", "tta"), Seq("doc_a"))
      .join(side("doc_b", "kb", "vb", "ttb"), Seq("doc_b"))
      .withColumn("smin",
        sortedKeyMinSum(col("ka"), col("va"), col("kb"), col("vb")))
      .filter(col("smin") > 0)
      .select(col("doc_a"), col("doc_b"),
        round(col("smin") /
          (col("tta") + col("ttb") - col("smin")).cast("double"), 6)
          .as("jw"))
      .filter(col("jw") >= threshold)
  }

  /** Asymmetric shingle containment (Broder's C(A→B) = |S_A ∩ S_B| /
    * |S_A| on 3-gram token shingles) over the doc_id % 5 sample —
    * the quote/subset detector that symmetric Jaccard misses: a
    * paragraph wholly contained in a larger doc scores ~1.0 in one
    * direction and low in the other. Shingle SETS build inside the
    * scan projection (array HOF + array_distinct, no joins); the
    * intersection is the one pair join, per-doc set sizes attach
    * broadcast, and both directions emit from the SAME intersection
    * row. Exact integers to the single output division. */
  def shingleContainment(s: SparkSession, d: String,
      threshold: Double = 0.05): DataFrame =
    shingleContainmentPairsDf(
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text")), threshold)

  /** [[shingleContainment]] over an arbitrary (doc_id, text) frame, with
    * a LOSSLESS prefix-filtered candidate join (the containment analogue
    * of [[weightedJaccardPairsDf]]'s AllPairs index): the raw shingle
    * self-join is df² in a hot shingle's document frequency — one
    * corpus-common 3-gram ("of the and"-class boilerplate) makes the
    * candidate join quadratic in the corpus.
    *
    * Why lossless: a qualifying pair has max(c_ab, c_ba) =
    * cap / min(s_x, s_y) survive the 6-dp rounding, i.e. cap ≥
    * ⌈(t−5·10⁻⁷)·s_min⌉ =: o — an overlap bound KNOWN FROM THE SMALLER
    * DOC ALONE. So orient every pair by the (size, doc_id) total order:
    * the SMALLER doc is the index side and may skip any o−1 of its own
    * shingles (the common set has ≥ o members, so at least one is still
    * indexed); the larger doc probes with its FULL shingle set. Skipping
    * the o−1 globally HOTTEST (df-desc) maximizes pruning: a
    * corpus-wide shingle ranks hottest in every doc, so it stays
    * indexed only by docs too small to skip anything — candidate
    * fan-out through it is df_small-docs × df, never df². Candidates
    * dedup and rescore EXACTLY from the full postings: output identical
    * to the naive join (the oracle stays the full self-join). The
    * overlap bound is exact integer arithmetic (⌈a/b⌉ as
    * (a + b − 1) DIV b); the true double threshold applies only at the
    * output edge, exactly as before. `threshold` must be a multiple of
    * 10⁻⁶ (the rounding grain the bound mirrors). */
  private[graft] def shingleContainmentPairsDf(docs: DataFrame,
      threshold: Double = 0.05): DataFrame = {
    require(threshold >= 1e-6 && threshold <= 1.0 &&
      math.abs(threshold * 1e6 - math.round(threshold * 1e6)) < 1e-9,
      s"threshold must be a multiple of 1e-6 in (0, 1], got $threshold")
    // candidate cutoff: round(cap/s, 6) >= t ⟺ cap ≥ (t − 5e-7)·s,
    // as the exact rational tNum/tDen
    val tNum = math.round(threshold * 1e7) - 5
    val tDen = 10000000L
    // set sizes compute IN-ROW (size of the distinct shingle array,
    // before the explode) so postings carry them for free — no count
    // shuffle, no size joins against the 16×-corpus posting stream
    // the CHECKPOINT sits BEFORE the explode: projection collapse
    // substitutes the (expensive) distinct-shingle array expression
    // into every consumer, and a post-explode projection of size(arr)
    // re-evaluates it PER POSTING ROW — measured 20× slower at ×16.
    // Materializing (doc_id, sz, arr) evaluates the array exactly once;
    // the explode below is a cheap read of materialized arrays for
    // each of the four downstream consumers. The scan repartitions
    // first: replica parquet can land in a handful of input splits,
    // and the HOF-heavy tokenize/shingle projection must not run at
    // 3-way parallelism on a 32-core box.
    val pre = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(w) - 3), i -> " +
          "concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2), " +
          "element_at(w, i + 3))))").as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("sz"),
        col("arr"))
      .localCheckpoint()
    val sh = pre.select(col("doc_id"), col("sz"),
      explode(col("arr")).as("sh"))
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // per-doc prefix: skip the o−1 hottest shingles (window bounded by
    // document size, the q256 bounded-key discipline)
    val wHot = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").desc, col("sh").desc)
    val ranked = sh.join(dfreq, Seq("sh"))
      .withColumn("rn", row_number().over(wHot))
      .withColumn("o",
        greatest(lit(1L), expr(s"($tNum * sz + ${tDen - 1}) DIV $tDen")))
      .localCheckpoint() // prefix + skipped sides split from one ranking
    val idx = ranked.filter(col("rn") >= col("o"))
      .select(col("doc_id").as("doc_s"), col("sz").as("ss"), col("sh"))
    // the o−1 hottest shingles each small doc left out of its index —
    // ≤ t·|S| rows per doc, the bounded correction set
    val skipped = ranked.filter(col("rn") < col("o"))
      .select(col("doc_id").as("doc_s"), col("sh"))
    // prefix-side intersection counts: small-side prefix ⋈ large-side
    // FULL postings, one row per common indexed shingle; the (size, id)
    // total order orients each unordered pair exactly once. No
    // distinct-then-rescore second pass: cap splits EXACTLY into
    // |prefix_s ∩ B| (this aggregate) + |skipped_s ∩ B| (the bounded
    // correction below) — the full self-join never happens
    val capPrefix = idx
      .join(sh.select(col("doc_id").as("doc_l"), col("sh"),
        col("sz").as("sl")), Seq("sh"))
      .filter(col("ss") < col("sl") ||
        (col("ss") === col("sl") && col("doc_s") < col("doc_l")))
      .groupBy(col("doc_s"), col("doc_l"), col("ss"), col("sl"))
      .agg(count(lit(1)).as("cap_p"))
      .localCheckpoint() // the correction join + final output share it
    // correction: of the small doc's skipped (hottest) shingles, how
    // many the large doc contains — pair-keyed joins only, never a
    // shingle-keyed join that a corpus-wide hot shingle could blow up
    val capSkip = capPrefix.select(col("doc_s"), col("doc_l"))
      .join(skipped, Seq("doc_s"))
      .join(sh.select(col("doc_id").as("doc_l"), col("sh")),
        Seq("doc_l", "sh"))
      .groupBy(col("doc_s"), col("doc_l"))
      .agg(count(lit(1)).as("cap_k"))
    capPrefix
      .join(capSkip, Seq("doc_s", "doc_l"), "left_outer")
      .withColumn("cap", col("cap_p") + coalesce(col("cap_k"), lit(0L)))
      .select(least(col("doc_s"), col("doc_l")).as("doc_a"),
        greatest(col("doc_s"), col("doc_l")).as("doc_b"), col("cap"),
        round(col("cap") / when(col("doc_s") < col("doc_l"), col("ss"))
          .otherwise(col("sl")).cast("double"), 6).as("c_ab"),
        round(col("cap") / when(col("doc_s") < col("doc_l"), col("sl"))
          .otherwise(col("ss")).cast("double"), 6).as("c_ba"))
      .filter(col("c_ab") >= threshold || col("c_ba") >= threshold)
  }

  /** Per-source lexical-richness profile — the corpus-health metrics a
    * pretraining pipeline tracks per ingestion source: token count N,
    * vocabulary V, type-token ratio V/N, hapax fraction (tokens seen
    * exactly once — the long-tail share), and Herdan's C = ln V / ln N
    * (the TTR variant that is stable across corpus sizes). Two partial-
    * aggregated shuffles (token counts per (source, token); per-source
    * rollup); ratios are single divisions of exact longs, ln on exact
    * longs. */
  def lexicalRichness(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        explode(expr("filter(split(lower(text), ' '), x -> x != '')"))
          .as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        count_if(col("c") === 1).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        round(col("vocab") / col("n_tokens").cast("double"), 6).as("ttr"),
        round(col("hapax") / col("vocab").cast("double"), 6)
          .as("hapax_frac"),
        round(log(col("vocab").cast("double")) /
          log(col("n_tokens").cast("double")), 6).as("herdan_c"))

  /** Gopher-style intra-document repetition signals (Rae et al. 2021's
    * "repetitious text" rules, token-count form): the fraction of the
    * document occupied by its single most frequent 2-gram and the
    * duplicate-token fraction — the quality filters that catch
    * keyword-stuffed / boilerplate-looped pages which per-document
    * length or stopword checks (q75 Gopher rules) miss. Every signal
    * computes IN-ROW with array HOFs (q274's single-pass lesson): ZERO
    * shuffles, zero materializations, one scan projection — the
    * first-shipped form checkpointed the tokenized corpus and shuffled
    * it at token grain twice, and the round-10 ×64 attribution run
    * measured those as ~50 s of q259's 39.8-s-total budget (the
    * aggregates dominated the whole pipeline). All counts are exact
    * longs; the two fractions divide once at the output edge, and the
    * flag compares in INTEGER arithmetic (max_bg·100 > total_bg·18 —
    * the Gopher 0.18 top-2-gram threshold with no float compare to
    * drift across engines). Deterministic doc_id % 10 sample. */
  def repetitionSignals(s: SparkSession, d: String): DataFrame =
    flattenSignals(repetitionSignalsRawDf(
      Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
        // width-pinned exchange + barrier checkpoint, the q259 shape:
        // the projection is interpreted per-doc work whose parallelism
        // otherwise tracks the file layout, and without the barrier
        // flattenSignals' null guard is substituted below the exchange
        // and re-evaluates the struct at scan width
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("doc_id")))
      .localCheckpoint())

  /** All per-doc counting signals as ONE expression over `text`,
    * returning a struct (null for sub-2-token docs). The token array is
    * bound as a LAMBDA VARIABLE (`transform(array(<w>), w -> …)[1]`),
    * not a projected alias: Catalyst's predicate pushdown substitutes
    * referenced aliases into filter conditions regardless of cost, and
    * with `w` a plain alias every `element_at(w, i)` inside the bigram
    * lambdas re-inlines the full filter(split(lower(text))) —
    * re-tokenizing the document PER ARRAY ELEMENT, ~1 ms/doc instead of
    * ~0.1 ms (the first cut of this rewrite shipped that way and
    * measured q259 at 359 s on the ×64 replica). A lambda variable is
    * bound once per evaluation, so however many times the optimizer
    * duplicates the outer expression, per-element work stays O(1). */
  private val sigStructExpr: String =
    """element_at(transform(array(filter(split(lower(text), ' '), t -> t != '')), w ->
      |  IF(size(w) >= 2, named_struct(
      |    'n_tok', bigint(size(w)),
      |    'n_distinct', bigint(size(array_distinct(w))),
      |    'total_bg', bigint(size(w) - 1),
      |    'max_bg', aggregate(
      |      array_sort(transform(sequence(0, size(w) - 2), i ->
      |        concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))),
      |      named_struct('prev', cast(null as string),
      |                   'run', bigint(0), 'mx', bigint(0)),
      |      (acc, x) -> named_struct(
      |        'prev', x,
      |        'run', IF(acc.prev <=> x, acc.run + 1, bigint(1)),
      |        'mx', greatest(acc.mx,
      |          IF(acc.prev <=> x, acc.run + 1, bigint(1)))),
      |      acc -> acc.mx)),
      |    cast(null as struct<n_tok: bigint, n_distinct: bigint,
      |      total_bg: bigint, max_bg: bigint>))), 1)""".stripMargin

  /** [[repetitionSignals]] over an arbitrary (doc_id, text) frame. The
    * max-bigram multiplicity is the longest equal-run of the SORTED
    * bigram array — q274's fold — so the whole signal table is one
    * projection; [[sigStructExpr]]'s scaladoc explains the lambda
    * binding that keeps it cheap under optimizer duplication. Callers
    * that filter on the signal columns over a large corpus should
    * exchange + checkpoint first (the q259 shape): the checkpoint is a
    * pushdown barrier, and the exchange decouples the interpreted-HOF
    * projection's parallelism from the source file layout. */
  def repetitionSignalsDf(docs: DataFrame): DataFrame =
    flattenSignals(repetitionSignalsRawDf(docs))

  /** The unfiltered (doc_id, sig struct) projection. Callers that
    * filter on signal columns over a large corpus checkpoint THIS
    * frame (the q259 shape): once materialized, no downstream filter
    * can be substituted below the projection — without the barrier
    * even the null-guard filter pushes beneath a caller's exchange and
    * re-evaluates the whole struct expression at scan-partition
    * width. */
  def repetitionSignalsRawDf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(sigStructExpr).as("sig"))

  private[operators] def flattenSignals(raw: DataFrame): DataFrame =
    raw
      .filter(col("sig").isNotNull) // <2-token docs have no bigram
      .select(col("doc_id"),
        col("sig.n_tok").as("n_tok"),
        col("sig.n_distinct").as("n_distinct"),
        col("sig.total_bg").as("total_bg"),
        col("sig.max_bg").as("max_bg"),
        round(col("sig.max_bg") / col("sig.total_bg").cast("double"), 6)
          .as("top2_frac"),
        round((col("sig.n_tok") - col("sig.n_distinct")) /
          col("sig.n_tok").cast("double"), 6).as("dup_tok_frac"),
        (col("sig.max_bg") * 100 > col("sig.total_bg") * 18)
          .as("flagged"))

  /** Pointwise-mutual-information collocation mining over document
    * co-occurrence: which frequent token pairs appear in the same
    * document more often than independence predicts? pmi =
    * ln(c_ab·D / (c_a·c_b)) on document frequencies — the classic
    * corpus-statistics feature for phrase detection. The plan shrinks
    * first: per-doc DISTINCT tokens (one shuffle), document-frequency
    * marginals (tiny, broadcast), and a df-threshold BEFORE the pair
    * self-join so the quadratic step runs only over frequent tokens per
    * doc — the same bound-the-blowup discipline as q186's basket lift.
    * All counts are exact longs; pmi is one division + one ln at the
    * output edge. */
  def pmiCollocations(s: SparkSession, d: String, minDf: Long = 50L,
      minPair: Long = 20L): DataFrame = {
    val dt = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr(
          "filter(split(lower(text), ' '), x -> x != '')")).as("tok"))
      .distinct()
    val df = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val ft = dt.join(broadcast(df), Seq("tok")).localCheckpoint()
    val nDocs = Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"))
    val a = ft.select(col("doc_id"), col("tok").as("tok_a"),
      col("df").as("c_a"))
    val b = ft.select(col("doc_id"), col("tok").as("tok_b"),
      col("df").as("c_b"))
    a.join(b, Seq("doc_id")).filter(col("tok_a") < col("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"), col("c_a"), col("c_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPair)
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("c_a"), col("c_b"),
        col("c_ab"),
        round(log((col("c_ab") * col("n_docs")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")), 6).as("pmi"))
  }

  /** Fixed-size overlapping token chunks — the context-window shard
    * prep every training-data pipeline runs before tokenizer packing:
    * chunk c covers tokens [c·stride, c·stride + size), the final
    * chunk may run short, a document shorter than one window yields
    * exactly one chunk. Chunk count is pure integer arithmetic
    * (⌈(n−size)/stride⌉+1), the chunk index explodes from an in-row
    * `sequence`, and the chunk itself is an array slice — the whole
    * operator is a join-free, shuffle-free scan projection (one
    * Generate), so it scales with the token count and nothing else.
    * Each chunk emits its token count and an md5 fingerprint of the
    * re-joined text (the downstream cross-shard dedup key). */
  def chunkOverlap(s: SparkSession, d: String, size: Int = 64,
      stride: Int = 48): DataFrame =
    chunkOverlapDf(Tables.documents(s, d), size, stride)

  /** [[chunkOverlap]] over any (doc_id, text) frame. STATELESS (pure
    * per-row projection + explode), so the same call chunks a
    * STREAMING frame — arriving documents chunk incrementally with no
    * watermark or state store; StreamingSpec pins stream-vs-batch
    * parity. */
  def chunkOverlapDf(docs: DataFrame, size: Int = 64,
      stride: Int = 48): DataFrame = {
    require(stride > 0 && size >= stride,
      "chunks must advance and overlap non-negatively")
    docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .withColumn("n", size_(col("ws")))
      .withColumn("nchunks",
        when(col("n") <= size, lit(1L)).otherwise(
          expr(s"((n - $size + ${stride - 1}) div $stride) + 1")))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), col("nchunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("ws"), (col("chunk_id") * stride + 1).cast("int"),
          lit(size)).as("ch"))
      .select(col("doc_id"), col("chunk_id"),
        size_(col("ch")).as("chunk_tokens"),
        md5(array_join(col("ch"), " ")).as("chunk_md5"))
  }

  /** Feature-space width for [[dsirWeights]]: tokens hash into 256
    * buckets (two hex chars of md5), the hashed-n-gram trick that keeps
    * the feature dimension fixed regardless of vocabulary size. */
  val DsirBuckets = 256

  /** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    * arXiv:2302.03169) in its hashed-unigram form: estimate a target
    * and a raw bag-of-hashed-features distribution, score every
    * document by its log importance weight
    * Σ_f c_f · (ln p̂_target(f) − ln p̂_raw(f)) with add-one smoothing,
    * and flag the target-like documents (positive log weight). The
    * target here is the corpus' English slice — the stand-in for "a
    * high-quality reference corpus" that makes the query self-contained
    * over the testdata.
    *
    * Determinism across engines: the feature id is substr(md5(token),
    * 1, 2) — a STRING bucket both engines compute identically, no
    * numeric hex conversion needed; λ_f comes from exact integer counts
    * through correctly-rounded IEEE division and ln (the q127 bigram-LM
    * discipline, gate-proven); the per-doc sum rounds to 4 dp before
    * both the output AND the target_like compare, so summation-order
    * tail noise cannot flip either.
    *
    * 100 TB shape: the λ table is DsirBuckets rows — a broadcast
    * dimension built from one partial-aggregated pass over per-doc
    * feature counts; scoring is a broadcast join + one shuffle keyed by
    * doc_id. No corpus-sized join anywhere, no global window; the
    * target estimate needs no second scan (it filters the same counts
    * relation). */
  def dsirWeights(s: SparkSession, d: String): DataFrame =
    dsirWeightsDf(Tables.documents(s, d))

  /** Per-(doc, lang, hashed-feature) counts — the one corpus pass both
    * the λ estimate and the scoring join derive from; pinned so the
    * tokenize+explode scan runs once. */
  private def dsirCounts(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("lang"), explode(
      expr("filter(split(lower(text), ' '), x -> x != '')")).as("tok"))
    .select(col("doc_id"), col("lang"),
      substring(md5(col("tok")), 1, 2).as("f"))
    .groupBy(col("doc_id"), col("lang"), col("f"))
    .agg(count(lit(1)).as("c"))
    .localCheckpoint()

  private def dsirLambdaFrom(dtf: DataFrame): DataFrame = {
    val raw = dtf.groupBy(col("f")).agg(sum(col("c")).as("r_f"))
    val tgt = dtf.filter(col("lang") === "en")
      .groupBy(col("f")).agg(sum(col("c")).as("t_f"))
    val tot = dtf.agg(
      sum(col("c")).as("big_r"),
      sum(when(col("lang") === "en", col("c")).otherwise(lit(0L)))
        .as("big_t"))
    raw.join(tgt, Seq("f"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("f"),
        (log((coalesce(col("t_f"), lit(0L)) + lit(1L)).cast("double") /
          (col("big_t") + lit(DsirBuckets.toLong)).cast("double")) -
          log((col("r_f") + lit(1L)).cast("double") /
            (col("big_r") + lit(DsirBuckets.toLong)).cast("double")))
          .as("lam"))
  }

  /** The frozen λ table alone — the TRAIN half of train-then-apply:
    * estimate once on a reference corpus, [[dsirApplyDf]] the (tiny,
    * ≤ DsirBuckets-row) result to score any later corpus or stream. */
  def dsirLambda(docs: DataFrame): DataFrame =
    dsirLambdaFrom(dsirCounts(docs))

  def dsirWeightsDf(docs: DataFrame): DataFrame = {
    val dtf = dsirCounts(docs)
    dtf.join(broadcast(dsirLambdaFrom(dtf)), Seq("f"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tok"),
        round(sum(col("c") * col("lam")), 4).as("log_weight"))
      .withColumn("target_like", col("log_weight") > 0.0)
  }

  /** Frozen-λ scoring — the APPLY half of train-then-apply: score
    * documents against a λ table trained earlier ([[dsirLambda]]),
    * without re-estimating anything. The whole computation is one
    * STATELESS scan projection (array HOFs folding over a
    * 256-entry map literal), so the SAME call scores a STREAMING
    * frame — arriving documents score incrementally with no state
    * store, watermark, or shuffle, the model-apply analogue of the
    * q252 streaming chunker. Buckets absent from the frozen table
    * contribute 0 (neutral — nothing was learned about them).
    * Token-order float accumulation differs from the batch trainer's
    * per-feature grouping by IEEE reordering noise only; the parity
    * spec bounds it at 1e-3 after the shared 4-dp rounding. */
  def dsirApplyDf(docs: DataFrame, lam: Map[String, Double]): DataFrame = {
    val keys = lam.keys.toSeq.sorted
    val m = map_from_arrays(
      array(keys.map(lit): _*),
      array(keys.map(k => lit(lam(k))): _*))
    docs
      .withColumn("w",
        expr("filter(split(lower(text), ' '), x -> x != '')"))
      .select(col("doc_id"),
        size_(col("w")).cast("long").as("n_tok"),
        round(aggregate(
          transform(col("w"), t =>
            coalesce(element_at(m, substring(md5(t), 1, 2)), lit(0.0))),
          lit(0.0), (acc, x) => acc + x), 4).as("log_weight"))
      .filter(col("n_tok") >= 1)
      .withColumn("target_like", col("log_weight") > 0.0)
  }

  /** Winnowing document fingerprints — Schleimer/Wilkerson/Aiken 2003
    * (the MOSS algorithm): hash every K-token gram, slide a window of W
    * consecutive gram hashes, record the MINIMUM hash of each window,
    * dedupe. Winnowing guarantees any shared run of K+W−1 tokens yields
    * at least one shared fingerprint, at an expected density of 2/(W+1)
    * — the position-robust sampling that plain every-Nth-gram selection
    * lacks (an insertion shifts every later gram). Output per document:
    * gram/window/fingerprint counts, the selected min/max fingerprints
    * (exact checksums of the selected SET), and the observed density.
    *
    * Scale shape: the ENTIRE computation is one scan projection — gram
    * hashing, window minima, and the distinct-set collapse are array
    * HOFs per row; no join, no shuffle, no state, so rows never
    * interact and the cost is linear in corpus tokens (the same
    * join-free shape as q252 chunking). Hashes are 8-hex-char md5
    * prefixes compared as ASCII strings — binary collation on both
    * engines, so min-selection reproduces exactly. */
  def winnowing(s: SparkSession, d: String): DataFrame =
    winnowingDf(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** [[winnowing]] over an arbitrary (doc_id, text) frame. */
  def winnowingDf(docs: DataFrame, k: Int = 4, w: Int = 5): DataFrame =
    docs
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("t"))
      .filter(size_(col("t")) >= k + w - 1)
      .select(col("doc_id"), size_(col("t")).cast("long").as("n_tok"),
        expr(s"transform(sequence(0, size(t) - $k), i -> " +
          s"substring(md5(concat_ws(' ', slice(t, i + 1, $k))), 1, 8))")
          .as("g"))
      .select(col("doc_id"), col("n_tok"),
        size_(col("g")).cast("long").as("n_kgrams"),
        expr(s"array_distinct(transform(sequence(0, size(g) - $w), " +
          s"j -> array_min(slice(g, j + 1, $w))))").as("fps"))
      .select(col("doc_id"), col("n_tok"), col("n_kgrams"),
        (col("n_kgrams") - (w - 1)).as("n_windows"),
        size_(col("fps")).cast("long").as("n_fingerprints"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"),
        round(size_(col("fps")) /
          (col("n_kgrams") - (w - 1)).cast("double"), 6).as("density"))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): train the
    * q127 Laplace bigram LM on the TARGET slice only (the corpus' en
    * documents — CCNet trains on target-language Wikipedia), score EVERY
    * document's bigrams against that frozen model, and cut each
    * language's score distribution into head/middle/tail terciles — the
    * buckets CCNet ships as quality tiers (head ≈ cleanest third).
    *
    * Out-of-model mass follows Laplace exactly: an unseen pair scores
    * −log₂(1/(c₁+V)) and an unseen first word −log₂(1/V) — both the
    * smoothing formula's own zero-count values via left joins, no
    * special cases. Tercile assignment is RANK-FREE: per-language
    * cumulative counts over the DISTINCT 4-dp-rounded scores (a
    * value-count compression whose grain is bounded by the rounding, not
    * the corpus — the q228 discipline), bucket chosen by integer
    * arithmetic (cum·3 ≤ n → head; ≤ 2n → middle), ties sharing a value
    * share a bucket on both engines. Scale shape: the model is one
    * content-keyed count shuffle on the en slice; scoring joins doc
    * bigram counts against the model tables (content-keyed, partial-
    * aggregated); no per-language ranking window ever materializes. */
  def ccnetBuckets(s: SparkSession, d: String): DataFrame =
    ccnetBucketsDf(Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text")))

  /** [[ccnetBuckets]] over an arbitrary (doc_id, lang, text) frame. */
  def ccnetBucketsDf(docs: DataFrame): DataFrame = {
    val dbg = docs
      .select(col("doc_id"), col("lang"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
      .filter(size_(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> named_struct('w1', a, 'w2', b))")).as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.w1"), col("bg.w2"))
      .groupBy(col("doc_id"), col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint() // model counts + the scoring join share it
    val cnt = dbg.filter(col("lang") === "en")
      .groupBy(col("w1"), col("w2")).agg(sum(col("k")).as("c12"))
    val uni = cnt.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    // PRECONDITION: the model trains on the corpus' en slice. If that
    // slice is EMPTY, v would be 0 and every score -log2(1/0) → ±Inf/NaN
    // garbage; flooring v at 1 keeps the smoothing denominator positive
    // (every doc then scores a deterministic 0.0 — "no model" reads as
    // indistinguishable docs, not NaNs). Mirrored in the oracle.
    val voc = cnt.agg(greatest(count_distinct(col("w2")), lit(1L)).as("v"))
    val scored = dbg
      .join(cnt, Seq("w1", "w2"), "left_outer")
      .join(uni, Seq("w1"), "left_outer")
      .crossJoin(broadcast(voc))
      .select(col("doc_id"), col("lang"), col("k"),
        (-log2((coalesce(col("c12"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + col("v")))).as("nll"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(sum(col("k") * col("nll")) / sum(col("k")), 4)
        .as("bits_per_bigram"),
        sum(col("k")).as("n_bigrams"))
      .localCheckpoint() // value-count cutoffs + the output share it
    // rank-free terciles: cumulative doc counts over DISTINCT rounded
    // scores per language (grain bounded by the 4-dp rounding)
    val vc = scored.groupBy(col("lang"), col("bits_per_bigram"))
      .agg(count(lit(1)).as("c"))
    val cw = Window.partitionBy(col("lang")).orderBy(col("bits_per_bigram"))
    val cum = vc
      .withColumn("cum", sum(col("c")).over(
        cw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(scored.groupBy(col("lang")).agg(count(lit(1)).as("n")),
        Seq("lang"))
      .select(col("lang"), col("bits_per_bigram"),
        when(col("cum") * 3 <= col("n"), lit("head"))
          .when(col("cum") * 3 <= col("n") * 2, lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
    scored.join(cum, Seq("lang", "bits_per_bigram"))
      .select(col("doc_id"), col("lang"), col("bits_per_bigram"),
        col("n_bigrams"), col("ppl_bucket"))
  }

  /** Per-source unigram KL divergence from the corpus distribution — the
    * mixture-drift monitor a multi-source pretraining pipeline runs per
    * ingestion batch: KL(P_source ‖ P_corpus) in bits, with token and
    * vocabulary mass per source. A source whose language model suddenly
    * diverges (scraper broke, boilerplate flood, wrong-language feed)
    * moves this number before any downstream metric does. No smoothing
    * is needed: every term in the sum has c_sw ≥ 1 and the corpus count
    * dominates the source count (c_w ≥ c_sw), so KL is finite and ≥ 0 by
    * construction.
    *
    * Determinism discipline: all four counts are exact integers; each
    * term evaluates log2 on exact longs (the q127/q263 gate-proven
    * ln-of-integer-counts rule), written as log2(k)+log2(N)−log2(ns)−
    * log2(cw) rather than one log of a product so no integer product can
    * overflow at any corpus size; the per-source sum rounds to 4 dp.
    *
    * Scale shape: per-(source, word) counts are one content-keyed
    * partial-aggregated shuffle; corpus word counts aggregate FROM those
    * counts (never re-scanning text); the join back is word-keyed 1:1
    * per source (no explosion — a hot word contributes |sources| rows,
    * never df²); source totals and the corpus total broadcast. Output
    * grain is |sources|. */
  def sourceKl(s: SparkSession, d: String): DataFrame =
    sourceKlDf(Tables.documents(s, d).select(col("source"), col("text")))

  /** [[sourceKl]] over an arbitrary (source, text) frame. */
  def sourceKlDf(docs: DataFrame): DataFrame = {
    val csw = docs
      .select(col("source"), explode(
        expr("filter(split(lower(text), ' '), x -> x != '')")).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint() // corpus counts + the term join share it
    val cw = csw.groupBy(col("w")).agg(sum(col("k")).as("cw"))
    val ns = csw.groupBy(col("source")).agg(sum(col("k")).as("ns"))
    val nt = csw.agg(sum(col("k")).as("nn"))
    csw.join(cw, Seq("w"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nt))
      .select(col("source"), col("ns"),
        ((col("k").cast("double") / col("ns")) *
          (log2(col("k")) + log2(col("nn")) -
            log2(col("ns")) - log2(col("cw")))).as("term"))
      .groupBy(col("source"), col("ns"))
      .agg(count(lit(1)).as("vocab"), round(sum(col("term")), 4).as("kl_bits"))
      .select(col("source"), col("ns").as("n_tokens"), col("vocab"),
        col("kl_bits"))
  }

  /** Hashed-bucket distribution drift — q265's KL monitor in FROZEN-MODEL
    * form: tokens collapse to 256 md5-prefix buckets (the q257 DSIR
    * feature space), the reference distribution is the corpus' own
    * bucket counts, and each source scores KL(source ‖ reference) in
    * bits. The full-vocab q265 is the precise offline monitor; this is
    * the apply-side shape — the reference model is ≤ 256 rows (a
    * broadcast literal in the frozen form), so scoring needs NO
    * corpus-sized model join at all: per-(source, bucket) counts whose
    * post-partial-agg grain is |sources|·256, then a map-side lookup.
    * [[driftReference]]/[[driftApplyDf]] split the same computation into
    * train-once / score-anything (including an unbounded stream — see
    * graft.streaming.StreamingDrift), the q257 dsirLambda/dsirApply
    * architecture.
    *
    * The reference smooths Laplace-style ((c_ref+1)/(N_ref+256), the
    * q263 discipline) so a bucket the reference never saw stays finite;
    * KL(p ‖ q) ≥ 0 survives smoothing (Σq ≤ 1 only adds log(1/Σq) ≥ 0).
    * Terms evaluate log2 on exact longs, separately (overflow-free at
    * any corpus size); the per-source sum rounds to 4 dp. */
  def hashedDrift(s: SparkSession, d: String): DataFrame =
    hashedDriftDf(Tables.documents(s, d).select(col("source"), col("text")))

  /** [[hashedDrift]] over an arbitrary (source, text) frame. */
  def hashedDriftDf(docs: DataFrame): DataFrame = {
    val csb = docs
      .select(col("source"), explode(expr(
        "transform(filter(split(lower(text), ' '), x -> x != ''), " +
          "t -> substring(md5(t), 1, 2))")).as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("k"))
      .localCheckpoint() // reference counts + the scoring share it
    val ref = csb.groupBy(col("b")).agg(sum(col("k")).as("cr"))
    val nt = ref.agg(sum(col("cr")).as("nr"))
    val ns = csb.groupBy(col("source")).agg(sum(col("k")).as("ns"))
    csb.join(broadcast(ref), Seq("b"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nt))
      .select(col("source"), col("ns"),
        ((col("k").cast("double") / col("ns")) *
          (log2(col("k")) + log2(col("nr") + 256) -
            log2(col("ns")) - log2(col("cr") + 1))).as("term"))
      .groupBy(col("source"), col("ns"))
      .agg(round(sum(col("term")), 4).as("kl_bits"))
      .select(col("source"), col("ns").as("n_tokens"), col("kl_bits"))
  }

  /** Train-once half: the frozen ≤256-entry reference bucket counts of a
    * corpus, as a driver map — the model [[driftApplyDf]] and
    * StreamingDrift score against. Bounded collect by construction. */
  def driftReference(docs: DataFrame): Map[String, Long] =
    docs
      .select(explode(expr(
        "transform(filter(split(lower(text), ' '), x -> x != ''), " +
          "t -> substring(md5(t), 1, 2))")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Score-anything half: per-source KL against a FROZEN reference.
    * The model enters as a ≤256-entry map literal (no join with any
    * corpus-sized table); the only shuffle is the per-(source, bucket)
    * count whose post-partial-agg grain is |sources|·256. Works
    * unchanged on a streaming frame in complete/update-mode aggregation;
    * StreamingDrift holds the same counts as keyed state instead. */
  def driftApplyDf(docs: DataFrame, ref: Map[String, Long]): DataFrame = {
    val nr = ref.values.sum
    val keys = ref.keys.toSeq.sorted
    val m = map_from_arrays(
      array(keys.map(lit): _*),
      array(keys.map(k => lit(ref(k))): _*))
    docs
      .select(col("source"), explode(expr(
        "transform(filter(split(lower(text), ' '), x -> x != ''), " +
          "t -> substring(md5(t), 1, 2))")).as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("k"))
      .select(col("source"), col("k"),
        coalesce(element_at(m, col("b")), lit(0L)).as("cr"))
      .groupBy(col("source"))
      // Σ (k/ns)·(log2 k − log2 ns + C_b) = [Σ k·(log2 k + C_b)]/ns −
      // log2 ns with C_b = log2(nr+256) − log2(cr+1): ns folds out of
      // the per-term sum, so ONE aggregation pass suffices (no
      // source-totals rejoin) — stream-safe in update mode
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("k").cast("double") *
          (log2(col("k")) + log2(lit(nr + 256.0)) - log2(col("cr") + 1)))
          .as("part"))
      .select(col("source"), col("n_tokens"),
        round(col("part") / col("n_tokens") - log2(col("n_tokens")), 4)
          .as("kl_bits"))
  }

  /** Vocabulary-coverage curve — the tokenizer-design diagnostic: what
    * fraction of corpus TOKEN MASS does a top-V type vocabulary cover,
    * for a sweep of budgets V? The complement (1 − coverage) is the
    * OOV/byte-fallback rate a V-entry tokenizer would pay, which is
    * what actually decides vocab size against Zipf's tail (q215 fits
    * the exponent; this reads off the operative consequence). Types
    * rank by (freq desc, token asc) — a TOTAL order, so the curve is
    * deterministic under frequency ties.
    *
    * Scale shape: one token-count aggregate (partial-aggregated), then
    * [[GlobalOrder.runningSums]] ranks the VOCABULARY frame — the
    * range-partitioned two-level prefix sum, never a single-partition
    * window, so a billion-type web vocabulary ranks at cluster
    * parallelism; each budget reads one filtered aggregate off the
    * pinned ranked frame (|sizes| linear scans, no window). */
  def vocabCoverage(s: SparkSession, d: String,
      sizes: Seq[Int] = Seq(4, 8, 16, 32, 64)): DataFrame =
    vocabCoverageDf(
      Tables.documents(s, d).select(col("text")), sizes)

  /** [[vocabCoverage]] over an arbitrary (text) frame. */
  def vocabCoverageDf(docs: DataFrame,
      sizes: Seq[Int] = Seq(4, 8, 16, 32, 64)): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ > 0), "budgets must be positive")
    val tf = docs
      .select(explode(
        expr("filter(split(lower(text), ' '), x -> x != '')")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val ranked = GlobalOrder.runningSums(tf,
      Seq(col("freq").desc, col("tok").asc),
      Seq("cum" -> col("freq"), "rank" -> lit(1L)))
      .localCheckpoint() // one ranked vocab frame feeds every budget
    val tot = ranked.agg(sum(col("freq")).as("n_tokens"),
      count(lit(1)).as("vocab"))
    sizes.map { v =>
      ranked.filter(col("rank") <= v)
        .agg(max(col("rank")).as("n_types"), max(col("cum")).as("covered"))
        .select(lit(v.toLong).as("v"), col("n_types"), col("covered"))
    }.reduce(_.union(_))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("n_types"), col("covered"),
        round(col("covered").cast("double") / col("n_tokens"), 6)
          .as("coverage"))
  }

  /** Effective sample size of the DSIR importance weights, per language
    * — the degeneracy diagnostic importance sampling requires (Owen,
    * "Monte Carlo theory" ch. 9): ESS = (Σw)²/Σw² on the normalized
    * weights w = exp(logw − max logw). ESS ≈ n means the reweighted
    * corpus behaves like n independent docs; ESS ≪ n means a few
    * huge-weight docs dominate the resample and the target estimate is
    * noise — the failure mode of aggressive distribution matching that
    * a mean log-weight (q257's output) cannot see.
    *
    * Determinism: log-weights enter at q257's committed 4-dp rounding;
    * the per-language max is an exact double compare; w rounds to 8 dp
    * after the one exp (input identical on both engines, and the 8-dp
    * quantization absorbs libm last-ulp drift); w² is one IEEE multiply
    * of identical doubles, quantized to 12 dp; BOTH sums accumulate in
    * DECIMAL(30,12) (order-independent); the two output ratios divide
    * rounded values (re-quantize rule). Scale shape: q257's scoring
    * pass, a |langs|-row broadcast max, one partial-aggregated rollup
    * — no windows, no pair joins. */
  def dsirEss(s: SparkSession, d: String): DataFrame =
    dsirEssDf(Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text")))

  /** [[dsirEss]] over an arbitrary (doc_id, lang, text) frame. */
  def dsirEssDf(docs: DataFrame): DataFrame = {
    val lw = dsirWeightsDf(docs).select(col("lang"), col("log_weight"))
    val mx = lw.groupBy(col("lang")).agg(max(col("log_weight")).as("mx"))
    lw.join(broadcast(mx), Seq("lang"))
      .select(col("lang"),
        round(exp(col("log_weight") - col("mx")), 8).as("w"))
      .select(col("lang"), col("w").cast("decimal(30,12)").as("wd"),
        round(col("w") * col("w"), 12).cast("decimal(30,12)").as("w2"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("wd")).as("sw"),
        sum(col("w2")).as("sww"))
      .select(col("lang"), col("n_docs"),
        round(pow(col("sw").cast("double"), 2) /
          col("sww").cast("double"), 4).as("ess"))
      .withColumn("ess_ratio",
        round(col("ess") / col("n_docs"), 6))
      .withColumn("degenerate", col("ess_ratio") < 0.5)
  }

  /** Lexicon words and integer valences for [[sentimentBynSource]] —
    * SURVEY §2.3's "broadcast lexicon join + agg" sentiment pattern
    * (the Twitter-Spark paper shape from PAPERS.md). Deliberately tiny
    * and integer-valued: the engineering point is the JOIN-FREE scoring
    * shape, not lexical coverage. */
  val SentimentLexicon: Map[String, Int] =
    Map("fast" -> 1, "big" -> 1, "slow" -> -1, "small" -> -1)

  /** Lexicon-based sentiment scoring, rolled up per source — the §2.3
    * text-analysis mapping's last unimplemented line. Each document's
    * score is the integer sum of its tokens' lexicon valences; the
    * rollup reports document polarity counts and the mean score.
    *
    * The lexicon enters as a LITERAL MAP folded inside the scan
    * projection (array HOF), so scoring is join-free AND shuffle-free —
    * strictly cheaper than the paper's broadcast join, which becomes
    * the right shape only when the lexicon outgrows an expression
    * literal (≳10⁵ entries); the rollup is one partial-aggregated
    * |sources|-grain shuffle. All counts and scores are exact integers;
    * the one mean divides at the output edge and rounds to 4 dp. */
  def sentimentBySource(s: SparkSession, d: String): DataFrame =
    sentimentBySourceDf(
      Tables.documents(s, d).select(col("source"), col("text")))

  /** [[sentimentBySource]] over an arbitrary (source, text) frame.
    * Stateless scan + rollup: the scoring projection applies unchanged
    * to a streaming frame. */
  def sentimentBySourceDf(docs: DataFrame): DataFrame = {
    val keys = SentimentLexicon.keys.toSeq.sorted
    val m = map_from_arrays(
      array(keys.map(lit): _*),
      array(keys.map(k => lit(SentimentLexicon(k).toLong)): _*))
    docs
      .select(col("source"),
        aggregate(
          transform(expr("filter(split(lower(text), ' '), x -> x != '')"),
            t => coalesce(element_at(m, t), lit(0L))),
          lit(0L), (acc, x) => acc + x).as("score"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("score") < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("score") === 0, 1L).otherwise(0L)).as("n_neutral"),
        sum(col("score")).as("total_score"),
        round(sum(col("score")) / count(lit(1)).cast("double"), 4)
          .as("mean_score"))
  }

  // org.apache.spark.sql.functions.size, un-shadowed by method params
  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Corpus-preparation operators a large-scale training-data pipeline
  * needs beyond dedup/similarity: test-set decontamination, weighted
  * sampling, sequence packing, deterministic global shuffle, corpus
  * n-gram statistics, embedding quantization, and duplicate-cluster
  * resolution.
  *
  * Scale design: every operator is keyed dataflow — hash-partitioned
  * shuffles, windows partitioned by a sharding key, no driver-side
  * state, no all-pairs joins. All randomness is replaced by the
  * engine-portable rolling hash ([[TextHash.rollingHash]]) so results
  * are deterministic and the DuckDB oracle replays them exactly.
  */
object PipelineOps {

  /** Salted portable hash of a document id: rollingHash(prefix || id).
    * Different prefixes give independent hash streams (sampling vs
    * sharding vs packing must not correlate).
    */
  private def idHash(prefix: String) =
    TextHash.rollingHash(concat(lit(prefix), col("doc_id").cast("string")))

  /** Test-set decontamination: training documents sharing >= `minShared`
    * distinct word n-grams with any held-out evaluation document. The
    * held-out set is a deterministic 5% hash split (in production it is
    * the real eval suite). Shape: shingle both sides, df-cap the
    * ubiquitous shingles (a boilerplate phrase shared by k docs would
    * contribute k^2 join rows on one key), equi-join on the shingle
    * hash, count per (train, test) pair — linear in corpus + shared
    * shingles, never all-pairs.
    */
  def decontaminate(docs: DataFrame, n: Int = 4, minShared: Int = 3,
      dfCap: Int = 256): DataFrame = {
    // "distinct shingles per document" is a PER-ROW dedup: array_distinct
    // on the hashed longs before exploding — the equivalent global
    // .distinct() after the explode shuffled #docs x #shingles rows
    // (54M rows / 7 min at the 2M-doc scale smoke; this shape is
    // shuffle-free and took decontaminate to ~11s there).
    val base = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        (pmod(idHash("t"), lit(20)) === 0).as("is_test"),
        explode(array_distinct(
          TextHash.shingleHashes(split(col("text"), " "), n))).as("sh"))
    val rare = base.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("sh")
    val capped = base.join(rare, "sh")
    val train = capped.filter(!col("is_test"))
      .select(col("doc_id").as("train_doc"), col("sh"))
    val test = capped.filter(col("is_test"))
      .select(col("doc_id").as("test_doc"), col("sh"))
    train.join(test, "sh")
      .groupBy("train_doc", "test_doc")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("train_doc", "test_doc")
  }

  /** Deterministic per-source weighted sampling (domain mixing): each
    * source gets a keep-rate in [20, 90)% derived from its name, each
    * document an independent hash draw in [0, 100). A pure filter —
    * no shuffle, fully pushdown-friendly, linear at any scale.
    */
  def sampleBySource(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        (pmod(TextHash.rollingHash(col("source")), lit(70)) + 20).as("rate"),
        pmod(idHash("s"), lit(100)).as("draw"))
      .filter(col("draw") < col("rate"))
      .select("doc_id", "source", "rate")
      .orderBy("doc_id")

  /** Per-source document cap (domain balancing — the web-corpus rule
    * that no domain may contribute more than N documents): rank each
    * source's documents by an independent hash draw (deterministic
    * "random" N, not first-N-by-id) and keep rank <= cap. The
    * rank-filter compiles to a WindowGroupLimit plan: each input task
    * keeps only its local top-cap rows per source BEFORE the shuffle,
    * so a dominant source costs cap rows per upstream task, not a
    * full-source sort — the shape that survives one domain owning 10%
    * of a 100 TB crawl. Hash ties break on doc_id.
    */
  def sourceCap(docs: DataFrame, cap: Int = 10): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(idHash("c").asc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= cap)
      .orderBy("doc_id")
  }

  /** Curriculum ordering — the composition of this family's quality
    * signals into a training order: documents pass the Gopher rule gate
    * ([[TextAnalysis.gopherRules]] passes=1 — the rule gate, unlike the
    * untrained hash-weight classifier, is corpus-shape-robust), take
    * their PHASE from the CCNet perplexity bucket
    * ([[TextAnalysis.lmBuckets]]: phase 1 = most-fluent tercile
    * first), and are deterministically shuffled
    * WITHIN each phase via the shard+position trick ([[shuffleShards]])
    * — exactly how production curricula work: ordered phases, shuffled
    * content inside a phase (a score-exact global sort would buy
    * nothing and cost a total order). Windows are bounded by
    * (phase, shard); everything else is the two signal pipelines plus
    * two key joins. Single-word documents carry no LM signal and drop
    * out with the gate rejects.
    */
  def curriculum(docs: DataFrame, shards: Int = 8): DataFrame = {
    val phases = TextAnalysis.lmBuckets(docs)
      .select(col("doc_id"), col("bucket").as("phase"))
    val gate = TextAnalysis.gopherRules(docs)
      .filter(col("passes") === 1L).select("doc_id")
    val w = Window.partitionBy("phase", "shard")
      .orderBy(col("key"), col("doc_id"))
    docs.select(col("doc_id"), idHash("u").as("key"))
      .join(gate, "doc_id").join(phases, "doc_id")
      .withColumn("shard", pmod(col("key"), lit(shards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "phase", "shard", "pos")
      .orderBy("phase", "shard", "pos")
  }

  /** Sequence packing: assign documents to fixed-character-budget bins
    * (the proxy for token-budget packing of training sequences) with a
    * next-fit running sum. Windows are partitioned by (lang, shard) —
    * the shard key bounds any one window's data so the sort never
    * concentrates a language's whole corpus on one task at 100 TB.
    */
  def packSequences(docs: DataFrame, budget: Long = 4096,
      shards: Int = 16): DataFrame = {
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    docs.select(col("doc_id"), col("lang"), col("n_chars"),
        pmod(idHash("p"), lit(shards)).as("shard"))
      .withColumn("cum", sum("n_chars").over(w))
      // bin = floor(chars-before-this-doc / budget): next-fit by the
      // running sum; floor(double) is exact here (sums << 2^53)
      .withColumn("bin", floor((col("cum") - col("n_chars")) /
        lit(budget.toDouble)))
      .groupBy("lang", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
      .orderBy("lang", "shard", "bin")
  }

  /** Packing-efficiency evaluation of [[packSequences]]: the
    * utilization histogram of the produced bins — per 10%-of-budget
    * bucket, how many bins landed there, with exact min/max fill.
    * "How full are my training sequences" is the question that decides
    * whether the packing budget (or the next-fit policy) needs tuning;
    * non-terminal bins of a next-fit packer always exceed the budget's
    * remainder rule, so mass below ~50% flags fragmentation. Integer
    * arithmetic end to end: bucket = min(chars·10 div budget, 10) —
    * the 10-bucket lands bins that overflow the budget (a single doc
    * larger than the budget still gets its own bin).
    */
  def packEval(docs: DataFrame, budget: Long = 4096,
      shards: Int = 16): DataFrame =
    packSequences(docs, budget, shards)
      .select(least(expr(s"chars * 10 div $budget"), lit(10L))
        .as("util_bucket"), col("chars"))
      .groupBy("util_bucket")
      .agg(count(lit(1)).as("n_bins"), min("chars").as("min_chars"),
        max("chars").as("max_chars"))
      .orderBy("util_bucket")

  /** Deterministic global shuffle for training-data ordering: a salted
    * hash maps each document to a shard and a position within it.
    * Per-shard windows keep the sort distributed (no global orderBy of
    * the corpus); readers consume shards in index order for a stable
    * full permutation.
    */
  def shuffleShards(docs: DataFrame, shards: Int = 32): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("key"), col("doc_id"))
    docs.select(col("doc_id"), idHash("x").as("key"))
      .withColumn("shard", pmod(col("key"), lit(shards)))
      .withColumn("pos", row_number().over(w))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos")
  }

  /** Passage-level duplication census (the CCNet/RefinedWeb line-dedup
    * signal, adapted to the corpus's unpunctuated text): documents split
    * into non-overlapping `width`-word passages, passages fingerprinted,
    * and each document scored by how many of its passages also occur
    * elsewhere in the corpus — the per-document boilerplate/copy ratio
    * that drives drop-or-trim decisions. Shape: one explode + one
    * fingerprint-count shuffle + one join back on the fingerprint —
    * linear at any corpus size, no all-pairs anything.
    */
  def passageDupStats(docs: DataFrame, width: Int = 3): DataFrame = {
    val words = split(col("text"), " ")
    val nPass = ceil(size(words) / lit(width.toDouble)).cast("int")
    val fps = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), nPass - 1),
          i => md5(concat_ws(" ",
            slice(words, i * width + 1, lit(width)))))).as("fp"))
    val counts = fps.groupBy("fp").agg(count(lit(1)).as("n"))
    fps.join(counts, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup"))
      .orderBy("doc_id")
  }

  /** Maximal duplicated-substring spans — the rolling-window
    * exact-substring pass of the published training-data dedup recipe
    * (ExactSubstr), re-expressed relationally: every `width`-token
    * window (stride 1) fingerprints; a window that occurs at any OTHER
    * (doc, position) is duplicated; per document, overlapping
    * duplicated windows merge into maximal spans (gaps-and-islands
    * over window starts — a new span opens when the next duplicated
    * start clears the previous window entirely). Reports per-doc span
    * count, duplicated-token mass, and ratio — the numbers that drive
    * trim-the-span decisions, which the non-overlapping passage
    * fingerprints of [[passageDupStats]] cannot see: a duplicated run
    * straddling a passage boundary hashes as two unique passages
    * there, but every interior window of the run collides here.
    *
    * Scale shape: one explode (~n_tokens rows per doc), one
    * fingerprint-count shuffle, one join back, and one per-doc window
    * (partitioned by doc_id — no global sort, no all-pairs, no suffix
    * array). A 100 TB corpus pays 3 linear shuffles; the only
    * superlinear structure a true suffix array would buy — finding
    * duplicated runs SHORTER than `width` — is below the trim
    * threshold by construction.
    */
  def substrSpans(docs: DataFrame, width: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = split(col("text"), " ")
    val wins = docs.repartition(col("doc_id"))
      .filter(size(words) >= width)
      .select(col("doc_id"), size(words).cast("long").as("n_tokens"),
        posexplode(transform(sequence(lit(0), size(words) - width),
          i => md5(concat_ws(" ", slice(words, i + 1, lit(width))))))
          .as(Seq("p", "fp")))
    val counts = wins.groupBy("fp").agg(count(lit(1)).as("cnt"))
    val dup = wins.join(counts.filter(col("cnt") > 1), "fp")
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val spans = dup
      .withColumn("newspan",
        when(col("p") - lag("p", 1).over(byDoc) <= width - 1, 0L)
          .otherwise(1L)) // NULL lag (first row) lands here too
      .withColumn("isl", sum("newspan").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "isl")
      .agg(max("n_tokens").as("n_tokens"), min("p").as("s"),
        (max("p") + width - 1).as("e"))
    spans.groupBy("doc_id")
      .agg(max("n_tokens").as("n_tokens"), count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("dup_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** Deterministic train/valid/test assignment: an independent salted
    * hash draw per document (80/10/10), reported as a per-(split, lang)
    * census. A pure projection + one aggregation — the assignment
    * itself never shuffles and is reproducible at any scale.
    */
  def trainValTest(docs: DataFrame): DataFrame =
    docs.select(col("lang"), splitOf(col("doc_id")).as("split"))
      .groupBy("split", "lang").agg(count(lit(1)).as("n"))
      .orderBy("split", "lang")

  /** The 80/10/10 split label for an id expression — the ONE hash rule
    * [[trainValTest]], [[leakageSafeSplit]] and the e2e composite
    * share (a second inlined copy would let the rules silently
    * desynchronize and make n_leaky_docs measure against a rule
    * trainValTest no longer implements).
    */
  private def splitOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val b = pmod(TextHash.rollingHash(concat(lit("v"), id.cast("string"))),
      lit(100))
    when(b < 80, "train").when(b < 90, "valid").otherwise("test")
  }

  /** Leakage-safe train/valid/test split: assignment is by NEAR-DUP
    * CLUSTER, not by document — the same 80/10/10 hash rule as
    * [[trainValTest]], applied to the [[dedupClusters]] label
    * (documents outside any near-dup pair are their own singleton
    * group), so a near-duplicate of a test document can never land in
    * train. That is the contamination path a doc-level split leaves
    * wide open and decontamination-by-ngram only partially closes.
    * Output: one row per split with document count, group count, and
    * `n_leaky_docs` — how many documents the doc-level rule would have
    * assigned to a DIFFERENT split than their cluster, i.e. the
    * leakage this operator prevents, measured on this corpus.
    *
    * Scale: the cluster relation covers near-dup members only (tiny at
    * any corpus scale); one left join against it and one hash
    * aggregation over the corpus. No group ever spans splits BY
    * CONSTRUCTION (one hash per group) — the spec asserts it anyway.
    */
  def leakageSafeSplit(docs: DataFrame): DataFrame =
    leakageSafeSplit(docs, dedupClusters(docs))

  /** [[leakageSafeSplit]] over ALREADY-RESOLVED cluster labels — the
    * production shape: labels come from the persisted cluster index
    * ([[readClusterIndex]]), so consuming the split does not recluster
    * the corpus. Identical answer (the label relation is identical).
    */
  def leakageSafeSplit(docs: DataFrame, labels: DataFrame): DataFrame =
    leakageSafeAssignment(docs, labels)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("grp")).as("n_groups"),
        sum(when(col("doc_split") =!= col("split"), 1L).otherwise(0L))
          .as("n_leaky_docs"))
      .orderBy("split")

  /** End-to-end curation composite — the operators chained the way a
    * production corpus build chains them, proving the family COMPOSES
    * rather than existing as isolated queries: (1) the Gopher rule
    * gate ([[TextAnalysis.gopherRules]], passes = 1) drops junk; (2)
    * exact-dedup keep-best ([[Dedup.keepBest]]) keeps one
    * representative per fingerprint among the gated survivors; (3)
    * the leakage-safe rule assigns each survivor to train/valid/test
    * by its near-dup CLUSTER. Output: per split, document count,
    * group count, and total characters — the numbers a dataset card
    * quotes for the final cut.
    *
    * Scale: each stage is the already-audited linear shape of its
    * operator; the composition adds only doc-id semi-joins between
    * stages. Every stage is ALSO individually oracle-checked by its
    * own query, so a composite mismatch localizes immediately.
    */
  def e2eCuration(docs: DataFrame): DataFrame =
    e2eCuration(docs, dedupClusters(docs))

  /** [[e2eCuration]] with the near-dup cluster labels supplied — since
    * r12 the split stage groups by CORPUS-level clusters (the
    * persisted index), not clusters recomputed on the survivor subset:
    * two survivors that are both near-dups of the same GATED-OUT
    * document are transitively contamination-related, and a
    * survivor-only reclustering would silently put them in different
    * splits (besides recomputing the most expensive stage per
    * consumer, the r11 verdict's top item).
    */
  def e2eCuration(docs: DataFrame, labels: DataFrame): DataFrame = {
    val gated = docs.join(
      TextAnalysis.gopherRules(docs).filter(col("passes") === 1L)
        .select("doc_id"), "doc_id")
    val best = Dedup.keepBest(gated).select("doc_id")
    val survivors = docs.join(best, "doc_id")
    leakageSafeAssignment(survivors, labels)
      .join(survivors.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("grp")).as("n_groups"),
        sum("n_chars").as("total_chars"))
      .orderBy("split")
  }

  /** Per-document assignment behind [[leakageSafeSplit]] (spec
    * surface): (doc_id, grp, split, doc_split).
    */
  private[graft] def leakageSafeAssignment(docs: DataFrame): DataFrame =
    leakageSafeAssignment(docs, dedupClusters(docs))

  private[graft] def leakageSafeAssignment(docs: DataFrame,
      labels: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("grp"))
      .select(col("doc_id"), col("grp"),
        splitOf(col("grp")).as("split"),
        splitOf(col("doc_id")).as("doc_split"))

  /** Corpus-level most-frequent word n-grams (boilerplate detection,
    * contamination screening). N-grams are built with per-document
    * `lead` windows over exploded words — codegen'd window columns, no
    * interpreted array lambdas — and counted with a standard two-phase
    * hash aggregate (partial map-side combine absorbs hot keys).
    */
  def topNgrams(docs: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("w1", lead("w", 1).over(w))
      .withColumn("w2", lead("w", 2).over(w))
      .filter(col("w2").isNotNull)
      .select(concat_ws(" ", col("w"), col("w1"), col("w2")).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(k)
  }

  /** Tokenizer-vocabulary coverage audit: build the top-`vocabSize`
    * words by document frequency (the stand-in for a trained
    * tokenizer's vocab), then measure each source's out-of-vocabulary
    * token rate — the standard signal for "this source's text will
    * fragment into byte-fallback tokens" (code, non-Latin scripts,
    * boilerplate markup) when sizing a tokenizer or weighting a
    * mixture.
    *
    * Scale: the df aggregation and the coverage count are linear
    * corpus passes; the vocab itself is a TakeOrdered of vocabSize
    * rows and joins back as a broadcast — no shuffle of the token
    * stream against the vocab.
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 256): DataFrame = {
    val toks = docs.repartition(col("doc_id")).select(col("doc_id"),
      col("source"), explode(split(lower(col("text")), " ")).as("w"))
    val dfreq = toks.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(col("df").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy("source")
  }

  /** Oracle twin of [[vocabCoverage]]. */
  def vocabCoverageSql(vocabSize: Int = 256): String =
    s"""WITH toks AS (SELECT doc_id, source,
       |    unnest(string_split(lower(text), ' ')) AS w FROM documents),
       |dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
       |vocab AS (SELECT w FROM dfq ORDER BY df DESC, w LIMIT $vocabSize)
       |SELECT t.source, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_oov,
       |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS oov_rate
       |FROM toks t LEFT JOIN vocab v ON t.w = v.w
       |GROUP BY t.source ORDER BY t.source""".stripMargin

  /** Tokenizer-fertility eval per source — the corpus-card companion
    * to [[vocabCoverage]]: with the same top-`vocabSize` document-
    * frequency vocab standing in for a trained tokenizer, an in-vocab
    * word costs ONE token and an out-of-vocab word fragments into
    * byte-fallback pieces (ceil(len/4) — the deterministic stand-in
    * for BPE fallback granularity). Fertility = tokens emitted per
    * word, and chars-per-token = how much text a token carries; a
    * source whose chars/token is low relative to the corpus will
    * fragment badly under the tokenizer (code, non-Latin scripts,
    * markup) — the number that drives vocab sizing and mixture
    * weighting. All counts are exact integer sums; the two rates are
    * one IEEE division each of identically-agreed longs.
    *
    * Scale: same shape as [[vocabCoverage]] — linear token pass, a
    * TakeOrdered vocab broadcast back, one aggregation by source.
    */
  def vocabFertility(docs: DataFrame, vocabSize: Int = 256): DataFrame = {
    val toks = docs.repartition(col("doc_id")).select(col("doc_id"),
      col("source"), explode(split(lower(col("text")), " ")).as("w"))
    val dfreq = toks.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(col("df").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .select(col("source"), length(col("w")).cast("long").as("wl"),
        when(col("in_vocab").isNotNull, 1L)
          .otherwise(expr("(length(w) + 3) div 4")).as("toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum("toks").as("n_tokens"),
        sum("wl").as("n_chars"))
      .select(col("source"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        (col("n_tokens").cast("double") / col("n_words")).as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens"))
          .as("chars_per_token"))
      .orderBy("source")
  }

  /** Oracle twin of [[vocabFertility]] (DuckDB `//` floors — safe
    * here, all operands non-negative).
    */
  def vocabFertilitySql(vocabSize: Int = 256): String =
    s"""WITH toks AS (SELECT doc_id, source,
       |    unnest(string_split(lower(text), ' ')) AS w FROM documents),
       |dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w),
       |vocab AS (SELECT w FROM dfq ORDER BY df DESC, w LIMIT $vocabSize),
       |t AS (SELECT tk.source, length(tk.w) AS wl,
       |    CASE WHEN v.w IS NOT NULL THEN 1
       |         ELSE (length(tk.w) + 3) // 4 END AS toks
       |  FROM toks tk LEFT JOIN vocab v ON tk.w = v.w)
       |SELECT source, count(*) AS n_words,
       |  CAST(sum(toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(wl) AS BIGINT) AS n_chars,
       |  CAST(CAST(sum(toks) AS BIGINT) AS DOUBLE) / count(*) AS fertility,
       |  CAST(CAST(sum(wl) AS BIGINT) AS DOUBLE) /
       |    CAST(sum(toks) AS BIGINT) AS chars_per_token
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max |component|, components mapped to floor(e / scale *
    * 127). Emits per-vector summary stats (scale, sum/min/max of the
    * quantized values) — integer outputs the oracle hashes exactly.
    * Two key shuffles on vec_id, linear at any scale.
    */
  def quantize(emb: DataFrame): DataFrame = {
    val dims = emb.repartition(col("vec_id"))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "e")))
      .select(col("vec_id"), col("e").cast("double").as("e"))
    val scales = dims.groupBy("vec_id").agg(max(abs(col("e"))).as("amax"))
    dims.join(scales, "vec_id")
      .select(col("vec_id"), col("amax"),
        when(col("amax") === 0d, lit(0L))
          .otherwise(floor(col("e") / col("amax") * 127d)).as("q"))
      .groupBy("vec_id")
      .agg(max("amax").as("scale"), sum("q").as("q_sum"),
        min("q").as("q_min"), max("q").as("q_max"))
      .orderBy("vec_id")
  }

  /** Fixed-size character chunking with overlap (the context-window
    * splitter ahead of embedding/indexing): chunk i of a document covers
    * chars [i*stride, i*stride + size), stride = size - overlap, with
    * enough chunks that the last one reaches the end of the text. One
    * per-row explode — no shuffle, no state, linear at any corpus size
    * (chunk count is derived arithmetically per row, so the plan is the
    * same whether a document has 1 chunk or 10k).
    */
  def chunkDocuments(docs: DataFrame, size: Int = 400,
      overlap: Int = 64): DataFrame = {
    val stride = size - overlap
    require(stride > 0, "overlap must be smaller than size")
    docs
      .select(col("doc_id"), col("text"),
        // ceil((len - overlap) / stride), at least 1; the numerator is
        // always positive (>= stride - 1 - overlap > 0 for our params)
        greatest(expr(
          s"int((length(text) - $overlap + ${stride - 1}) div $stride)"),
          lit(1)).as("n_chunks"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        col("text").substr(col("chunk_id") * stride + 1, lit(size)).as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic mixture weighting (epoch repetition for domain
    * mixing): each source gets a weight w in [0.5, 2.5) hundredths-
    * encoded from its name; each document is emitted floor(w) times
    * plus one more when its hash draw falls under frac(w) — so a
    * source's expected multiplicity is exactly w without any RNG.
    * Pure per-row arithmetic + explode: no shuffle, linear, and the
    * upsampling factor is bounded by ceil(max weight).
    */
  def mixtureRepeat(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        (pmod(TextHash.rollingHash(col("source")), lit(200)) + 50).as("w100"),
        pmod(idHash("m"), lit(100)).as("draw"))
      .withColumn("reps",
        expr("w100 div 100") +
          when(col("draw") < col("w100") % 100, 1L).otherwise(0L))
      .filter(col("reps") > 0)
      .select(col("doc_id"), col("source"), col("w100"),
        explode(sequence(lit(1L), col("reps"))).as("copy_id"))
      .orderBy("doc_id", "copy_id")

  /** Temperature-resampled mixture weights at alpha = 0.5 — the
    * standard multi-source rebalance (sample source i proportional to
    * n_i^alpha): down-weights the dominant web crawl, up-weights small
    * high-quality sources, without the hard inversion of uniform
    * sampling. alpha = 1/2 is chosen deliberately: n^0.5 is an
    * IEEE-exact sqrt of an exact long (the one float op both engines
    * round identically), so the weights need no pow() — each source's
    * numerator is floor(sqrt(n_tokens)·1e6) as a long, the denominator
    * their exact sum, and the published weight one agreed division.
    * Emits per-source token mass, raw share, temperature weight, and
    * the implied repeat factor (weight/raw-share — >1 means the source
    * is over-sampled relative to its natural size).
    *
    * Scale: one groupBy(source) over the corpus (map-side partial),
    * then arithmetic on a handful of rows.
    */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val perSrc = docs
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy("source").agg(sum("toks").as("n_tokens"))
    val withNum = perSrc.withColumn("w_num",
      floor(sqrt(col("n_tokens").cast("double")) * lit(1e6)).cast("long"))
    val totals = withNum.agg(sum("n_tokens").as("tot_tokens"),
      sum("w_num").as("tot_w"))
    withNum.crossJoin(broadcast(totals))
      .select(col("source"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot_tokens"), 6)
          .as("raw_share"),
        round(col("w_num").cast("double") / col("tot_w"), 6)
          .as("temp_weight"),
        round((col("w_num").cast("double") / col("tot_w")) /
          (col("n_tokens").cast("double") / col("tot_tokens")), 6)
          .as("repeat_factor"))
      .orderBy("source")
  }

  /** Quality-gate operating curve: survivor count, keep rate, and
    * surviving token mass as the min-words threshold sweeps a grid —
    * the curve a pipeline owner reads before committing to a gate
    * value (every threshold is a (docs kept) x (tokens kept) tradeoff;
    * picking one blind either starves the corpus or keeps junk). ONE
    * pass over the corpus: per-doc word counts explode against the
    * literal threshold grid (|grid| rows per doc) and aggregate —
    * sweeping ten thresholds costs one scan, not ten.
    */
  def gateSweep(docs: DataFrame,
      thresholds: Seq[Int] = Seq(10, 25, 50, 100, 200)): DataFrame = {
    val nw = size(split(trim(col("text")), "\\s+")).cast("long")
    docs.select(nw.as("n_words"))
      .select(col("n_words"),
        explode(array(thresholds.map(lit(_)): _*)).as("min_words"))
      .groupBy("min_words")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_words") >= col("min_words"), 1L).otherwise(0L))
          .as("survivors"),
        sum(when(col("n_words") >= col("min_words"), col("n_words"))
          .otherwise(0L)).as("surviving_tokens"))
      .select(col("min_words").cast("long").as("min_words"),
        col("survivors"),
        round(col("survivors").cast("double") / col("n_docs"), 6)
          .as("keep_rate"),
        col("surviving_tokens"))
      .orderBy("min_words")
  }

  /** Data-quality audit (the Deequ/Great-Expectations shape): declared
    * expectations evaluated corpus-wide in ONE aggregation pass — each
    * rule is a conditional count over the same scan, so auditing ten
    * rules costs the same scan as auditing one. Emits (rule, violations,
    * n_rows); a pipeline gates promotion on violations == 0. All rules
    * here are engine-portable predicates.
    */
  def qualityAudit(docs: DataFrame): DataFrame = {
    val n = count(lit(1))
    def viol(pred: org.apache.spark.sql.Column) =
      sum(when(pred, 1L).otherwise(0L))
    docs.agg(
      n.as("n_rows"),
      viol(col("doc_id").isNull).as("null_id"),
      viol(col("text").isNull || length(col("text")) === 0).as("empty_text"),
      viol(length(col("text")) =!= col("n_chars")).as("bad_n_chars"),
      viol(!col("lang").isin("en", "de", "fr", "es", "zh")).as("bad_lang"),
      viol(col("n_chars") > 100000L).as("oversized"),
      (n - countDistinct(col("doc_id"))).as("dup_ids"))
      .select(lit("documents").as("dataset"), col("n_rows"),
        col("null_id"), col("empty_text"), col("bad_n_chars"),
        col("bad_lang"), col("oversized"), col("dup_ids"))
  }

  /** The composed corpus filter a training-data pipeline actually runs —
    * language gate, quality gate, near-dup survivorship, deterministic
    * downsample — chained over the individual operators by doc_id
    * equi-joins (co-partitioned key shuffles at scale; each stage is
    * the already-verified operator, so the composition is too).
    */
  def filterCompose(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.quality(docs)
      .filter(col("n_tokens") >= 20 && col("alpha_ratio") >= 0.8)
      .select("doc_id", "n_tokens")
    val survivors = Dedup.fingerprint(docs).select("doc_id")
    docs.filter(col("lang") === "en")
      .join(q, "doc_id")
      .join(survivors, Seq("doc_id"), "left_semi")
      .filter(pmod(idHash("c"), lit(100)) < 50)
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** Deterministic HyperLogLog sketch registers over a key column:
    * bucket = portable hash mod 2^p, register = max over the bucket of
    * (1 + trailing-zero count of the remaining hash bits). The
    * registers ARE the sketch — integer, mergeable with a plain
    * per-bucket max (the property that makes HLL the distributed
    * approx-distinct structure: partial maxes combine map-side, one
    * tiny shuffle of <= 2^p rows regardless of input size), and
    * bit-replayable by the oracle, unlike builtin HLL implementations
    * whose register layout is engine-private. Trailing-zero count via
    * log2(h & -h) — exact in IEEE for powers of two, identical across
    * engines.
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 8): DataFrame = {
    val m = 1 << p
    df.select(graft.functions.HashFunctions.polyHash(
        col(keyCol).cast("string")).as("h"))
      .select(pmod(col("h"), lit(m.toLong)).as("bucket"),
        expr(s"h div $m").as("h2"))
      .select(col("bucket"),
        when(col("h2") === 0L, lit(31))
          .otherwise(expr("CAST(log2(h2 & -h2) AS INT) + 1")).as("rho"))
      .groupBy("bucket").agg(max("rho").as("register"))
      .orderBy("bucket")
  }

  /** Duplicate-cluster resolution: connected components over the
    * MinHash-LSH near-dup pair graph by min-label propagation, a fixed
    * `iters` rounds (deterministic, oracle-replayable; components here
    * are tiny — duplicate groups — so a small fixed hop count
    * converges). Each round is one groupBy on the edge key: linear in
    * edges, the standard large-graph CC shape.
    */
  def dedupClusters(docs: DataFrame, iters: Int = ClusterIters): DataFrame =
    // Cached: the propagation loop references the edge set 2x per round
    // (plus once for the node list); without the cache each reference
    // re-evaluates the whole MinHash signature+band pipeline. Edges are
    // near-dup pairs — tiny relative to the corpus at any scale.
    labelPropagation(graft.CacheScope.cached(Dedup.minhashPairs(docs)), iters)
      .orderBy("doc_id")

  /** Propagation depth shared by every consumer of the cluster labels
    * (from-scratch, index build, index refresh) AND the oracle's
    * unrolled l0..l3 chain — one constant so the rule cannot drift.
    */
  val ClusterIters = 3

  /** Min-label propagation over an undirected pair graph, a fixed
    * `iters` rounds (deterministic, oracle-replayable; near-dup
    * components are tiny — duplicate groups — so a small fixed hop
    * count converges). Each round is one groupBy on the edge key:
    * linear in edges, the standard large-graph CC shape. The caller
    * caches `pairs` (each round references the edge set twice).
    */
  private[graft] def labelPropagation(pairs: DataFrame,
      iters: Int = ClusterIters): DataFrame = {
    // undirected: both directions
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // SELF-LOOPS make each round a single aggregation: min over
    // N(v) ∪ {v} equals least(own label, min over neighbors), so the
    // round references the previous labels ONCE (r17). The previous
    // least()-formulation referenced them twice — which both nested
    // the logical plan 2^iters deep AND re-executed each round's join
    // 2^(iters−k) times at runtime (intermediates are deliberately
    // uncached; only `pairs` is, by the caller).
    // no distinct on the self-loops: duplicates are harmless under
    // min (idempotent) and the dedup shuffle would cost more than the
    // ≤2x row inflation it avoids
    val withSelf = edges.union(
      edges.select(col("src"), col("src").as("dst")))
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("lab", col("doc_id"))
    for (_ <- 1 to iters) {
      labels = withSelf
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("lab", "dlab"), "dst")
        .groupBy("src").agg(min("dlab").as("lab"))
        .withColumnRenamed("src", "doc_id")
    }
    labels.select(col("doc_id"), col("lab").as("cluster"))
  }

  // --- persisted near-dup cluster index --------------------------------
  // The r11 verdict's top item: dedup_cluster_stats, the leakage-safe
  // split, and the e2e composite each recomputed the full MinHash →
  // band → label-propagation chain per query once caches became
  // query-scoped — at 100 TB a per-CONSUMER reclustering is a
  // non-starter. The fix is the repo's own governed-index discipline
  // (bloom/near/BM25/PQ indexes): cluster once into CAS-committed
  // tables, let every downstream consumer read labels.
  //
  //   {t}_sig   (doc_id, s0..s15)   bucket(doc_id, 8)  append-only
  //   {t}_pairs (doc_a, doc_b)      bucket(doc_a, 8)   append-only
  //   {t}       (doc_id, cluster)   bucket(doc_id, 8)  REPLACED per refresh
  //
  // Signatures are the expensive pass (shingle + 16 rehashes over the
  // corpus) and are never recomputed for existing docs; a refresh
  // bands only the DELTA against the signature index (disjoint
  // doc_ids make the appended delta-pairs exactly the rebuild's new
  // pair set — see Dedup.deltaPairsFromSigs), then re-propagates
  // labels over the pair table. Label propagation is linear in the
  // pair set (near-dup pairs — tiny at any corpus scale), so the
  // replace commit is cheap; it uses commitReplacing("overwrite")
  // because reclustering is content-changing (a new doc can MERGE two
  // old clusters, relabelling rows a plain append could never touch).
  //
  // DENSITY CAVEAT (r15): the pair table is the EXACT band join
  // (Dedup.pairsFromSigs) — the refresh-equals-rebuild contract
  // depends on it (a capped pair set's survivors shift as the corpus
  // grows, so delta banding could not reproduce a capped rebuild).
  // On a boilerplate-heavy corpus whose band buckets run deep, the
  // exact join is quadratic in bucket depth; buildClusterIndex now
  // REFUSES such a corpus up front (r16 — the guard aggregate runs
  // before any table is committed) and points at the bounded-work
  // path: [[buildClusterIndexCapped]], whose per-bucket cap-survivor
  // state restores the refresh-equals-rebuild contract WITH bounded
  // work (top-cap by a static per-row rank is a semilattice:
  // top-cap(A ∪ B) = top-cap(top-cap(A) ∪ B), so persisted survivors
  // are sufficient state for an incremental fold). Alternatively,
  // exact-dedup the boilerplate first (Dedup.exact), which restores
  // shallow buckets and the exact index's full recall.

  /** The exact index's density-refusal threshold: the same integer
    * rule `Dedup.minhashLshAuto` routes on at its defaults
    * (cap 8 × slack 8) — the exact band join may cost at most 64×
    * the capped join's bounded candidate volume.
    */
  val ClusterIndexGuardCapSlack = 64L

  /** Build the cluster index from scratch. Refuses over an existing
    * index (fold growth in via [[refreshClusterIndex]]; drop the
    * tables to rebuild) — the bloom-index lesson: a blind rebuild
    * would append duplicate signature/pair rows. Also refuses a
    * DENSE corpus loudly (VERDICT r15 item 8): the pair table is the
    * exact band join, quadratic in bucket depth, so a corpus whose
    * measured candidate volume exceeds [[ClusterIndexGuardCapSlack]]×
    * the capped bound must use [[buildClusterIndexCapped]] (bounded
    * work, same refresh contract) or be exact-deduped first. The
    * guard runs BEFORE any table is committed, so a refusal leaves no
    * half-built index behind.
    */
  def buildClusterIndex(spark: SparkSession, docs: DataFrame, root: String,
      ns: String, table: String, iters: Int = ClusterIters): Unit = {
    requireNoExactIndex(root, ns, table)
    // cached: the guard aggregate and the committed write both read
    // the signature pass (the corpus-scale shingle+rehash cost)
    val sigsIn = graft.CacheScope.cached(Dedup.minhashSignatures(docs))
    val (exactVolume, bandRows) = Dedup.sigBandVolume(sigsIn)
    require(exactVolume <= bandRows * ClusterIndexGuardCapSlack,
      s"$ns.$table: this corpus's MinHash band buckets are too deep for " +
        s"the EXACT pair join (measured candidate volume $exactVolume > " +
        s"${bandRows * ClusterIndexGuardCapSlack} = band_rows × " +
        s"$ClusterIndexGuardCapSlack) — build a bounded-work index with " +
        "buildClusterIndexCapped, or exact-dedup the boilerplate first " +
        "(Dedup.exact) to restore shallow buckets")
    buildExactIndexFromSigs(spark, sigsIn, root, ns, table, iters)
  }

  private def requireNoExactIndex(root: String, ns: String, table: String,
      refreshHint: String = "refreshClusterIndex"): Unit =
    require(graft.plans.TableIO.currentVersion(root, ns, table) == 0L &&
        graft.plans.TableIO.currentVersion(root, ns, s"${table}_sig") == 0L,
      s"$ns.$table already holds a committed cluster index — fold new " +
        s"docs in with $refreshHint, or drop the index tables to rebuild")

  /** The exact build's commit phase, guard already passed — shared by
    * [[buildClusterIndex]] and [[buildClusterIndexAuto]]'s exact
    * branch so the corpus-wide guard aggregate runs exactly once per
    * build (r16 review).
    */
  private def buildExactIndexFromSigs(spark: SparkSession,
      sigsIn: DataFrame, root: String, ns: String, table: String,
      iters: Int): Unit = {
    import graft.plans.{PartitionSpec, Partitioning}
    Partitioning.preparePartitioned(spark, root, ns, s"${table}_sig",
      sigsIn, PartitionSpec("bucket", "doc_id", 8))
    val sigs = graft.plans.Mor.read(spark, root, ns, s"${table}_sig")
    Partitioning.preparePartitioned(spark, root, ns, s"${table}_pairs",
      Dedup.pairsFromSigs(sigs), PartitionSpec("bucket", "doc_a", 8))
    relabelClusterIndex(spark, root, ns, table, iters, replace = false)
  }

  /** Fold a delta corpus (disjoint doc_ids) into the index: append its
    * signatures, append its band-join pairs against the full signature
    * set, re-propagate labels over the pair table, and REPLACE the
    * label snapshot. Bit-identical to a from-scratch rebuild on the
    * union corpus (pinned by ClusterIndexSpec): the pair SET equals
    * the rebuild's, and propagation is a deterministic function of the
    * pair set.
    */
  def refreshClusterIndex(spark: SparkSession, delta: DataFrame, root: String,
      ns: String, table: String, iters: Int = ClusterIters): Unit = {
    import graft.plans.Partitioning
    // cached: referenced by both the signature append and the delta
    // band join — without it the delta's shingle pass runs twice
    val deltaSigs = graft.CacheScope.cached(Dedup.minhashSignatures(delta))
    Partitioning.appendPartitioned(spark, root, ns, s"${table}_sig",
      deltaSigs)
    val all = graft.plans.Mor.read(spark, root, ns, s"${table}_sig")
    Partitioning.appendPartitioned(spark, root, ns, s"${table}_pairs",
      Dedup.deltaPairsFromSigs(deltaSigs, all))
    relabelClusterIndex(spark, root, ns, table, iters, replace = true)
  }

  /** Re-run propagation over the committed pair table and publish the
    * label snapshot — initial commit on build, replacing commit (with
    * the "overwrite" changelog marker) on refresh.
    */
  private def relabelClusterIndex(spark: SparkSession, root: String,
      ns: String, table: String, iters: Int, replace: Boolean): Unit = {
    val pairs = graft.CacheScope.cached(
      graft.plans.Mor.read(spark, root, ns, s"${table}_pairs"))
    publishLabels(spark, root, ns, table, labelPropagation(pairs, iters),
      replace)
  }

  /** Shared label-snapshot publish: initial partitioned commit on
    * build, replacing commit (content-changing "overwrite" marker) on
    * refresh — a new doc can MERGE clusters, relabelling rows a plain
    * append could never touch.
    */
  private def publishLabels(spark: SparkSession, root: String, ns: String,
      table: String, labels: DataFrame, replace: Boolean): Unit = {
    import graft.plans.{PartitionSpec, Partitioning, TableIO}
    if (!replace)
      Partitioning.preparePartitioned(spark, root, ns, table, labels,
        PartitionSpec("bucket", "doc_id", 8))
    else {
      val spec = Partitioning.readSpec(root, ns, table).getOrElse(
        throw new IllegalStateException(s"$ns.$table has no partition spec"))
      val entries = Partitioning.writePartitioned(spark, root, ns, table,
        labels, spec, seq = TableIO.nextSeq(root, ns, table))
      TableIO.commitReplacing(root, ns, table, entries,
        operation = Some("overwrite"))
    }
  }

  /** DELTA label publish (r18, VERDICT r17 item 1): the scoped relabel
    * computes exactly the changed rows, so the label table gets the
    * same MOR maintenance the survivor table got in r17 — append the
    * ball's fresh label rows + ONE eq-delete file (doc_id-keyed) for
    * the relabel set, in one CAS commit at one sequence. The
    * strictly-lower-seq gate makes the folded read equal the old
    * full-replace row-for-row: every pre-refresh row of a relabeled
    * doc dies, every same-commit append survives, every row outside
    * the relabel set is untouched — which is precisely
    * `old ∖ relabel ∪ fresh⋂relabel`, the r17 replace expression.
    * This removes the last index-sized write from the steady-state
    * refresh (the replace re-wrote ALL labels per delta). Delete
    * files accumulate one per refresh and fold away past
    * [[MaxSurvDeleteFiles]], same policy as the survivors.
    */
  private def publishLabelsDelta(spark: SparkSession, root: String,
      ns: String, table: String, fresh: DataFrame,
      relabel: DataFrame): Unit =
    commitMorDelta(spark, root, ns, table, fresh, relabel.select("doc_id"))

  /** ONE copy of the index-maintenance MOR delta commit the three
    * cluster-index tables share (r18 review: the shape was pasted
    * three times, with the empty-guards already diverging): append
    * `adds` under the table's partition spec + one eq-delete file of
    * `deleteKeys` (whose OWN columns are the equality-identifier set —
    * full rows for the survivors, doc_id for labels, (band, key) for
    * the adjacency), all at one sequence in one CAS commit; then fold
    * accumulated delete files past [[MaxSurvDeleteFiles]]. Both sides
    * are guarded on emptiness — an empty append avoids a zero-file
    * partitioned write, an empty delete set avoids committing (and
    * eventually compacting away) zero-row delete files — so a no-op
    * delta leaves the table version untouched. Callers must pass
    * MATERIALIZED (checkpointed/cached) relations: the emptiness probe
    * and the write each run an action.
    */
  private def commitMorDelta(spark: SparkSession, root: String, ns: String,
      table: String, adds: DataFrame, deleteKeys: DataFrame): Unit = {
    import graft.plans.{Maintenance, Partitioning, TableIO}
    val spec = Partitioning.readSpec(root, ns, table).getOrElse(
      throw new IllegalStateException(s"$ns.$table has no partition spec"))
    val seq = TableIO.nextSeq(root, ns, table)
    val dataEntries =
      if (adds.isEmpty) Nil
      else Partitioning.writePartitioned(spark, root, ns, table, adds,
        spec, seq = seq)
    val delEntries =
      if (deleteKeys.isEmpty) Nil
      else Seq(TableIO.writeExactFile(spark, root, ns, table,
        s"data/eqdel-$seq.parquet", deleteKeys, "eq_delete", seq))
    val entries = dataEntries ++ delEntries
    if (entries.nonEmpty) TableIO.commit(root, ns, table, entries)
    if (TableIO.readManifest(root, ns, table)
        .count(_.content == "eq_delete") >= MaxSurvDeleteFiles)
      Maintenance.compact(spark, root, ns, table)
  }

  /** The capped index's bucket-ADJACENCY state `{t}_adj` (r18, VERDICT
    * r17 item 2): the multi-member-bucket survivor rows — exactly the
    * relation the scoped relabel used to re-derive per refresh with a
    * full-index groupBy (`multiKeys`) plus a full-index semi-join. A
    * bucket's multi-member status changes ONLY when the bucket's
    * membership changes, and a delta refresh changes membership only
    * in the touched buckets, so the adjacency is delta-maintainable by
    * the same MOR commit the survivors use: append the touched
    * buckets' new ≥2-member rows + one (band, key)-keyed eq-delete
    * file for ALL touched buckets. The steady-state refresh thereafter
    * reads adjacency as committed state — no full-index exchange
    * anywhere in its plan.
    */
  private def adjFromSurv(surv: DataFrame): DataFrame = {
    val multiKeys = surv.groupBy("band", "key")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("band", "key")
    surv.join(multiKeys, Seq("band", "key"), "left_semi")
  }

  /** Full rebuild of the adjacency state from the committed survivors
    * — the build path and the bulk/fallback refresh paths (the delta
    * path maintains it incrementally in [[refreshClusterIndexCapped]]).
    */
  private def commitAdjFull(spark: SparkSession, root: String, ns: String,
      table: String): Unit = {
    import graft.plans.{PartitionSpec, Partitioning, TableIO}
    val adj = adjFromSurv(
      graft.plans.Mor.read(spark, root, ns, s"${table}_surv")
        .select("doc_id", "band", "key"))
    if (TableIO.currentVersion(root, ns, s"${table}_adj") == 0L)
      Partitioning.preparePartitioned(spark, root, ns, s"${table}_adj",
        adj, PartitionSpec("bucket", "doc_id", 8))
    else {
      val spec = Partitioning.readSpec(root, ns, s"${table}_adj").getOrElse(
        throw new IllegalStateException(
          s"$ns.${table}_adj has no partition spec"))
      val entries = Partitioning.writePartitioned(spark, root, ns,
        s"${table}_adj", adj, spec,
        seq = TableIO.nextSeq(root, ns, s"${table}_adj"))
      TableIO.commitReplacing(root, ns, s"${table}_adj", entries,
        operation = Some("overwrite"))
    }
  }

  /** The refresh-atomicity token (r17 ADVICE, medium): a capped-index
    * refresh commits THREE tables in sequence (survivors, adjacency,
    * labels) — individually atomic, jointly not. A crash between
    * commits leaves them out of step, and the r17 scoped relabel
    * would have preserved the stale label rows outside the next
    * delta's ball VERBATIM — a silent, persistent refresh-vs-rebuild
    * divergence. Every completed build/refresh therefore records the
    * three table versions next to cluster-cap.json; the next refresh
    * takes the delta-maintenance branch ONLY if the live versions
    * still match. On any mismatch (interrupted refresh, external
    * compaction, legacy pre-r18 index) it falls back to rebuilding
    * the adjacency and relabeling in full from the committed
    * survivors — always correct, since the survivor fold itself is a
    * pure semilattice function of committed state.
    */
  private def writeClusterSync(root: String, ns: String,
      table: String): Unit = {
    import graft.plans.TableIO
    val sv = TableIO.currentVersion(root, ns, s"${table}_surv")
    val av = TableIO.currentVersion(root, ns, s"${table}_adj")
    val lv = TableIO.currentVersion(root, ns, table)
    java.nio.file.Files.writeString(
      graft.plans.TableIO.tableDir(root, ns, s"${table}_surv")
        .resolve("cluster-sync.json"),
      s"""{"surv":$sv,"adj":$av,"labels":$lv}""")
  }

  /** True iff the three index tables' live versions match the last
    * completed publish's token — the delta branch's precondition.
    */
  private def clusterInSync(root: String, ns: String,
      table: String): Boolean = {
    import graft.plans.TableIO
    val f = TableIO.tableDir(root, ns, s"${table}_surv")
      .resolve("cluster-sync.json")
    java.nio.file.Files.isRegularFile(f) && {
      val body = java.nio.file.Files.readString(f)
      def recorded(k: String): Option[Long] =
        s""""$k":(\\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
      recorded("surv").contains(
        TableIO.currentVersion(root, ns, s"${table}_surv")) &&
        recorded("adj").contains(
          TableIO.currentVersion(root, ns, s"${table}_adj")) &&
        recorded("labels").contains(TableIO.currentVersion(root, ns, table))
    }
  }

  // --- CAPPED cluster index: the dense-corpus scale path (r16) ----------
  // VERDICT r15 item 1: the exact index above gives dense corpora
  // EITHER incremental refresh OR bounded work, never both. The capped
  // index gives both by persisting the per-bucket CAP SURVIVORS as
  // index state instead of full signatures:
  //
  //   {t}_surv (doc_id, band, key)  bucket(doc_id, 8)  delta-committed
  //   {t}_adj  (doc_id, band, key)  bucket(doc_id, 8)  delta-committed
  //            (the ≥2-member-bucket survivor rows — the scoped
  //             relabel's adjacency, r18)
  //   {t}      (doc_id, cluster)    bucket(doc_id, 8)  delta-committed
  //
  // plus two marker files beside {t}_surv: cluster-cap.json (cap and
  // band shape — index state, not knobs) and cluster-sync.json (the
  // three table versions at the last completed publish — the
  // refresh-atomicity token). Small deltas maintain all three tables
  // by MOR delta commits (appends + one eq-delete file, auto-compacted
  // past MaxSurvDeleteFiles); bulk deltas and out-of-step state take
  // the full-rewrite path.
  //
  // Why survivors are sufficient state: capBuckets keeps the top-`cap`
  // rows per (band, key) under a STATIC total order (the Knuth rank is
  // a pure function of (doc_id, band); ties on doc_id) — and top-k
  // under a static total order is a semilattice,
  //   top-cap(A ∪ B) = top-cap(top-cap(A) ∪ B),
  // so re-capping (old survivors ∪ delta band rows) reproduces the
  // from-scratch capped banding of the union corpus BIT-FOR-BIT,
  // without ever re-touching old documents' text. A refresh therefore
  // costs: the delta's shingle pass, one window over (touched-bucket
  // survivors ∪ delta rows) — untouched buckets keep their frozen
  // survivors verbatim — and a label propagation over the survivor
  // self-join, whose pair volume is ≤ buckets × cap² by construction.
  // The survivor and label snapshots are both index-sized (≤ 4 band
  // rows per doc, ≤ cap per bucket), far smaller than the corpus, so
  // their replace commits are cheap at any scale.
  //
  // TRADE vs the exact index: recall. The capped pair set is the exact
  // set on corpora whose buckets are at or under the cap (spec-pinned
  // equivalence); past the cap it keeps a bounded survivor clique per
  // bucket — the measured loss and its re-banding mitigation live in
  // the ann_recall_eval_capped / _rebanded ledger rows.

  /** The cap AND the band shape are INDEX state, not per-call knobs:
    * chosen at build, recorded next to the survivor table, replayed
    * by every refresh — a refresh under a different cap or banding
    * would silently break the refresh-equals-rebuild contract (the
    * survivor rows' (band, key) space is defined by the shape).
    */
  private def writeClusterCap(root: String, ns: String, table: String,
      cap: Int, nBands: Int): Unit =
    java.nio.file.Files.writeString(
      graft.plans.TableIO.tableDir(root, ns, s"${table}_surv")
        .resolve("cluster-cap.json"),
      s"""{"cap":$cap,"bands":$nBands}""")

  /** (cap, nBands) of a committed capped index. Pre-r17 marker files
    * carry no "bands" field — those indexes were all built at the
    * then-only 4×4 shape.
    */
  private[graft] def readClusterCap(root: String, ns: String,
      table: String): (Int, Int) = {
    val f = graft.plans.TableIO.tableDir(root, ns, s"${table}_surv")
      .resolve("cluster-cap.json")
    require(java.nio.file.Files.isRegularFile(f),
      s"$ns.${table}_surv has no cluster-cap.json — not a capped cluster " +
        "index (exact indexes refresh via refreshClusterIndex)")
    val body = java.nio.file.Files.readString(f)
    val cap = """"cap":(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"bad cluster-cap.json: $body"))
    val nBands = """"bands":(\d+)""".r.findFirstMatchIn(body)
      .map(_.group(1).toInt).getOrElse(4)
    (cap, nBands)
  }

  /** Build the CAPPED cluster index from scratch: per-bucket cap
    * survivors of the corpus's MinHash band rows, committed as the
    * index state, then labels propagated over the survivor self-join.
    * Bounded work on ANY corpus density (pair volume ≤ buckets × cap²)
    * — the production path [[buildClusterIndex]]'s density guard
    * points at. Refuses over an existing index, like the exact build.
    */
  def buildClusterIndexCapped(spark: SparkSession, docs: DataFrame,
      root: String, ns: String, table: String, cap: Int = 8,
      iters: Int = ClusterIters, nBands: Int = 4): Unit =
    buildCappedIndexFromSigs(spark, Dedup.minhashSignatures(docs), root,
      ns, table, cap, nBands, iters)

  /** The capped build over an already-computed signature relation —
    * [[buildClusterIndexAuto]]'s capped branch hands its cached guard
    * signatures here EXPLICITLY (r16 advice: reuse via CacheManager
    * plan-matching was fragile to any divergence in how the two plans
    * were built), the twin of [[buildExactIndexFromSigs]]. `nBands`
    * becomes index state (see [[readClusterCap]]).
    */
  private def buildCappedIndexFromSigs(spark: SparkSession,
      sigsIn: DataFrame, root: String, ns: String, table: String,
      cap: Int, nBands: Int, iters: Int): Unit = {
    import graft.plans.{PartitionSpec, Partitioning, TableIO}
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(TableIO.currentVersion(root, ns, table) == 0L &&
        TableIO.currentVersion(root, ns, s"${table}_surv") == 0L,
      s"$ns.$table already holds a committed cluster index — fold new " +
        "docs in with refreshClusterIndexCapped, or drop the index " +
        "tables to rebuild")
    val surv = Similarity.capBuckets(
      Dedup.sigBands(sigsIn, nBands), "doc_id", cap, lit(0L))
      .select("doc_id", "band", "key")
    Partitioning.preparePartitioned(spark, root, ns, s"${table}_surv",
      surv, PartitionSpec("bucket", "doc_id", 8))
    writeClusterCap(root, ns, table, cap, nBands)
    // adjacency state from the COMMITTED survivors (not a recompute of
    // the shingle pipeline) — the one index-sized groupBy, paid at
    // build where it belongs, so no refresh ever re-derives it
    commitAdjFull(spark, root, ns, table)
    relabelClusterIndexCapped(spark, root, ns, table, iters)
    writeClusterSync(root, ns, table)
  }

  /** Fold a delta corpus (disjoint doc_ids — same contract as
    * [[refreshClusterIndex]]) into the capped index: band the DELTA
    * only, re-cap just the buckets the delta touches against their
    * frozen survivors (the semilattice fold — see the block comment
    * above), REPLACE the survivor snapshot, and re-propagate labels.
    * Bit-identical to [[buildClusterIndexCapped]] on the union corpus
    * (pinned by CappedClusterIndexSpec).
    */
  def refreshClusterIndexCapped(spark: SparkSession, delta: DataFrame,
      root: String, ns: String, table: String,
      iters: Int = ClusterIters): Unit = {
    import graft.plans.{Partitioning, TableIO}
    // cap AND band shape come from the index itself — a delta banded
    // at a different shape could never fold into the survivor space
    val (cap, nBands) = readClusterCap(root, ns, table)
    // cached: read by the touched-bucket semi-join key set and the
    // re-cap union — one shingle pass over the delta, not two
    val deltaBands = graft.CacheScope.cached(
      Dedup.sigBands(Dedup.minhashSignatures(delta), nBands)
        .select("doc_id", "band", "key"))
    val old = graft.plans.Mor.read(spark, root, ns, s"${table}_surv")
      .select("doc_id", "band", "key")
    val touchedKeys = deltaBands.select("band", "key").distinct()
    // touched-bucket OLD survivors, materialized (delta-bucket-sized):
    // read three ways below (re-cap union, survivor diff, scoped
    // relabel adjacency) and the checkpoint also cuts the
    // shingle-pipeline plan out of everything downstream
    val touched = old.join(touchedKeys, Seq("band", "key"), "left_semi")
      .localCheckpoint()
    val recapped = Similarity.capBuckets(
      touched.unionByName(deltaBands), "doc_id", cap, lit(0L))
      .select("doc_id", "band", "key")
      .localCheckpoint()
    // SIZE-ROUTED refresh (r17): both branches commit bit-identical
    // readable state, so the route is pure economics, decided from
    // numbers already in hand (two checkpointed row counts + the
    // manifest's metadata record counts — no extra scan).
    //  - DELTA branch (small deltas — the steady state): survivor
    //    state maintained by DELTA COMMIT — append the rows the
    //    re-cap ADDED, equality-delete the rows it EVICTED (both
    //    delta-bucket-sized), one CAS commit at one sequence.
    //    Eq-deletes apply to strictly-lower sequences (Mor.read's
    //    Iceberg-v2 gate), so same-commit appends are untouched and
    //    the folded read equals a full rewrite row-for-row.
    //    (doc_id, band, key) is a key — a doc holds one key per band
    //    — so the anti-joins are exact set differences. Labels then
    //    relabel component-scoped. Delete files accumulate one per
    //    refresh; Maintenance.compact folds them. Removed the r16
    //    index-sized floor: 13.4s → 8.1s at the 1M-doc smoke's
    //    1%-delta, and the gap grows with the index:delta ratio.
    //  - FULL branch (bulk deltas): when the changed-bucket volume is
    //    within [[FullRefreshFactor]]× of the whole index, the scoped
    //    machinery costs more than it saves (measured: the 1/3-corpus
    //    delta ran 31.8s scoped vs ~20s full) — rewrite the snapshot
    //    and relabel everything, exactly the r16 path.
    val keys3 = Seq("doc_id", "band", "key")
    // LIVE rows, not raw data rows (r17 review): every eq-delete row
    // kills exactly one committed survivor row (removes ⊆ old by
    // construction), so the live count is the manifest difference —
    // summing only data recordCounts would overstate a churn-heavy
    // index by its total historical evictions and let the route
    // drift ever further from the measured ~1/8 crossover.
    val survManifest = TableIO.readManifest(root, ns, s"${table}_surv")
    val indexRows =
      survManifest.filter(_.content == "data").map(_.recordCount).sum -
        survManifest.filter(_.content == "eq_delete").map(_.recordCount).sum
    val changedRows = touched.count() + deltaBands.count()
    val spec = Partitioning.readSpec(root, ns, s"${table}_surv").getOrElse(
      throw new IllegalStateException(
        s"$ns.${table}_surv has no partition spec"))
    // refresh-atomicity check (r17 ADVICE): read BEFORE any commit —
    // the token records the versions the last COMPLETED publish left
    // behind, so any mismatch means interrupted maintenance, external
    // compaction, or a legacy index; the scoped machinery would then
    // be folding against out-of-step state
    val inSync = clusterInSync(root, ns, table)
    if (changedRows * FullRefreshFactor >= indexRows) {
      val untouched = old.join(touchedKeys, Seq("band", "key"), "left_anti")
      val surv = untouched.unionByName(recapped)
      val entries = Partitioning.writePartitioned(spark, root, ns,
        s"${table}_surv", surv, spec,
        seq = TableIO.nextSeq(root, ns, s"${table}_surv"))
      TableIO.commitReplacing(root, ns, s"${table}_surv", entries,
        operation = Some("overwrite"))
      commitAdjFull(spark, root, ns, table)
      relabelClusterIndexCapped(spark, root, ns, table, iters)
    } else {
      val adds = recapped.join(touched, keys3, "left_anti")
      val removes = touched.join(recapped, keys3, "left_anti")
      val survChanged = !(adds.isEmpty && removes.isEmpty)
      // bound the read amplification the delta commits accumulate
      // (one eq-delete anti-join per refresh on every survivor read):
      // past the threshold, commitMorDelta folds everything back into
      // plain data files — index-sized work amortized over that many
      // refreshes
      commitMorDelta(spark, root, ns, s"${table}_surv", adds, removes)
      if (!inSync) {
        // out-of-step state: the survivor fold above is still exact
        // (pure function of committed survivors), but adjacency and
        // labels cannot be trusted for scoped maintenance — rebuild
        // both in full from the committed survivors
        commitAdjFull(spark, root, ns, table)
        relabelClusterIndexCapped(spark, root, ns, table, iters)
      } else if (survChanged) {
        // adjacency delta: the touched buckets' NEW ≥2-member rows
        // replace their old rows (one (band, key)-keyed eq-delete) —
        // delta-bucket-sized compute and commit, like the survivors
        commitMorDelta(spark, root, ns, s"${table}_adj",
          adjFromSurv(recapped), touchedKeys)
        relabelClusterIndexCappedScoped(spark, root, ns, table, iters,
          deltaBands, touched)
      }
      // survChanged == false with in-step state: the re-cap reproduced
      // every touched bucket verbatim (an all-evicted or empty delta),
      // so adjacency and labels already equal the union rebuild's —
      // skip the no-op commits (r18 review: the adjacency eq-delete
      // used to commit unconditionally, burning a version + an
      // eventual compaction per empty refresh)
    }
    writeClusterSync(root, ns, table)
  }

  /** Auto-compaction threshold for the survivor table's accumulated
    * eq-delete files (one per delta refresh).
    */
  val MaxSurvDeleteFiles = 8

  /** The size route's threshold: the delta branch runs only while the
    * changed-bucket row volume (old touched survivors + delta band
    * rows) is under 1/8 of the index — past that, scoped bookkeeping
    * costs more than the full rewrite it avoids (measured on the
    * 1M-doc smoke's 1/3-corpus delta).
    */
  val FullRefreshFactor = 8L

  /** COMPONENT-SCOPED relabel for the capped refresh (r17, VERDICT
    * r16 item 2): the full relabel re-ran the survivor self-join and
    * re-propagated over ALL pairs per refresh — an index-sized ~13s
    * floor that made small-delta refreshes no cheaper than rebuilds.
    * Labels under the fixed-`iters` propagation are LOCAL:
    * label(v) = min doc_id within `iters` hops of v, so a label can
    * change only for docs within `iters` hops of a changed edge, and
    * every changed edge (added OR removed by eviction) has both
    * endpoints among the TOUCHED buckets' members (old survivors +
    * delta docs — the seeds). The scoped relabel therefore:
    *   1. expands the seed set 2·iters hops through the bucket
    *      adjacency (new survivors ∪ old touched rows, so paths
    *      through removed edges are also covered) — every edge on any
    *      ≤iters-hop path from the relabel set lies inside this ball;
    *   2. recomputes the pair join and propagation ONLY among ball
    *      members (delta-sized, not index-sized);
    *   3. keeps every label row outside ball(seeds, iters) VERBATIM
    *      from the committed snapshot.
    * Bit-identical to the from-scratch relabel by the locality
    * argument (spec-pinned by CappedClusterIndexSpec and both
    * DedupScaleSmoke refresh-equals-rebuild checks); the refresh's
    * propagation cost drops from index-sized to ball-sized.
    */
  private def relabelClusterIndexCappedScoped(spark: SparkSession,
      root: String, ns: String, table: String, iters: Int,
      deltaBands: DataFrame, touchedOld: DataFrame): Unit = {
    // The hop loop below would otherwise embed the shingle-pipeline +
    // Mor-scan plans of its inputs into an ever-growing logical tree
    // that Catalyst re-analyzes and re-optimizes per hop — measured
    // 3s → 4s → 15s → 243s per hop on a 600-doc fixture (caching does
    // NOT truncate logical-plan work; only the physical plan reads the
    // cache). The delta-sized inputs and the ball itself are therefore
    // checkpointed — legitimate HERE, unlike in query operators: a
    // refresh is a TERMINAL maintenance op whose output is committed
    // files, so no downstream consumer plan loses auditability, and
    // the checkpointed relations are delta/ball-sized, far below the
    // index. `touchedOld` arrives already checkpointed by the caller.
    val touchedM = touchedOld
    val seeds = deltaBands.select("doc_id")
      .union(touchedM.select("doc_id")).distinct()
    // Adjacency: docs sharing a (band, key) bucket — in the NEW
    // survivor set (added edges) or the old touched rows (removed
    // edges). SINGLETON buckets cannot carry an edge, so the new-side
    // adjacency keeps only multi-member-bucket rows — bounded by
    // buckets × cap, typically a sliver of the index (on the 1M-doc
    // boilerplate smoke: ~3k rows of 4M). Since r18 it is COMMITTED
    // INDEX STATE ({t}_adj, delta-maintained by the caller's MOR
    // commit), read here as files — the r17 version re-derived it per
    // refresh with a full-index groupBy + semi-join, the last
    // index-sized exchange in the steady-state refresh (VERDICT r17
    // item 2). Docs whose buckets are all singletons are absent from
    // the adjacency and drop out of the ball harmlessly: they have no
    // pairs in either graph, hence no label row on any path (their
    // old rows, if touched, ride touchedM).
    val adjCore = graft.plans.Mor.read(spark, root, ns, s"${table}_adj")
      .select("doc_id", "band", "key")
      .localCheckpoint()
    val adj = adjCore.unionByName(touchedM)
    // each hop references the PREVIOUS ball exactly once — bucket
    // adjacency is reflexive for any doc with adjacency rows (a doc
    // occupies its own buckets), so the expansion is monotone without
    // a union. (Evicted delta docs drop out of the ball: they have no
    // edges in either graph and no label row on any path.) The
    // per-hop eager checkpoint keeps every hop's plan constant-sized.
    var ball = seeds.localCheckpoint()
    var relabelSet = ball
    for (h <- 1 to 2 * iters) {
      val keys = adj.join(ball, Seq("doc_id"), "left_semi")
        .select("band", "key").distinct()
      ball = adj.join(keys, Seq("band", "key"), "left_semi")
        .select("doc_id").distinct().localCheckpoint()
      if (h == iters) relabelSet = ball
    }
    val ballM = ball
    val relabelM = relabelSet
    // pairs can only arise in multi-member buckets — the pair join
    // reads the small adjacency core, not the index relation
    val ballSurv = adjCore.join(ballM, Seq("doc_id"), "left_semi")
    val pairs = graft.CacheScope.cached(
      Similarity.pairsAmongCapped(ballSurv, "doc_a", "doc_b",
        unordered = true))
    // delta label commit (r18): fresh ball labels appended, relabel-set
    // doc_ids eq-deleted, one commit — the old labels are never read,
    // let alone rewritten (the r17 version read ALL old labels,
    // anti-joined the ball, and full-replaced the snapshot). The ball
    // labels are checkpointed like every other ball-sized intermediate
    // here (r18 review): the publish probes emptiness AND writes — two
    // actions — and an unmaterialized `fresh` would re-run the whole
    // 3-round ball propagation for each.
    val freshBall = labelPropagation(pairs, iters)
      .join(relabelM, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    publishLabelsDelta(spark, root, ns, table, freshBall, relabelM)
  }

  /** The density-ROUTED cluster-index entry point — the persisted-
    * artifact completion of the `Dedup.minhashLshAuto` pattern (r16):
    * where [[buildClusterIndex]] REFUSES a dense corpus, this routes.
    * One guard aggregate over the corpus's band-bucket stats picks the
    * branch by the SAME integer rule the exact build's refusal and the
    * text router use: exact index (full recall; signature + pair
    * state) while the exact band join's measured candidate volume is
    * within [[ClusterIndexGuardCapSlack]]× the capped bound, capped-
    * survivor index ([[buildClusterIndexCapped]]) past it. The
    * committed index is self-describing — cluster-cap.json marks the
    * capped branch — so [[refreshClusterIndexAuto]] dispatches every
    * later delta to the refresh whose contract matches the state, and
    * a consumer never needs to remember which way a corpus routed.
    * The oracle replays the identical routing comparison, so testdata
    * regeneration cannot desynchronize route and oracle.
    */
  def buildClusterIndexAuto(spark: SparkSession, docs: DataFrame,
      root: String, ns: String, table: String, cap: Int = 8,
      iters: Int = ClusterIters): Unit = {
    // already-built refusal BEFORE the corpus-sized work (r16 review):
    // either branch's own require would also catch it, but only after
    // paying the signature pass + guard aggregate. The auto build also
    // refuses over a committed SURVIVOR table (r16 advice): an
    // interrupted capped build can leave _surv committed with no label
    // snapshot, and an exact build over that orphan would create MIXED
    // state (exact sig/pairs beside a stale capped marker) that the
    // auto refresh could then misroute on.
    requireNoExactIndex(root, ns, table, "refreshClusterIndexAuto")
    require(graft.plans.TableIO.currentVersion(root, ns,
        s"${table}_surv") == 0L,
      s"$ns.${table}_surv already holds committed capped-index state " +
        "(an interrupted capped build?) — drop the index tables before " +
        "rebuilding")
    val sigsIn = graft.CacheScope.cached(Dedup.minhashSignatures(docs))
    // ONE dual-shape guard job (r18): both shapes' volumes from a
    // single pass over the cached signatures — previously the capped
    // branch paid a second full aggregate at the re-banded 2×8 shape
    val (exactVolume, bandRows, rebandVolume) =
      Dedup.sigBandVolumeDual(sigsIn)
    if (exactVolume <= bandRows * ClusterIndexGuardCapSlack)
      // guard already passed — commit phase only, no second aggregate;
      // both branches explicitly consume the one cached signature pass
      buildExactIndexFromSigs(spark, sigsIn, root, ns, table, iters)
    else {
      // capped branch: shape-aware like the pair routers (r17) —
      // re-band iff it shrinks the candidate volume by ≥ RebandGain
      // (identical-clone corpora sit at exactly 0.5 and stay 4×4).
      // The picked shape is committed as index state, so refreshes
      // replay it without re-deciding.
      val nBands = if (rebandVolume * Dedup.RebandGain <= exactVolume) 2
        else 4
      buildCappedIndexFromSigs(spark, sigsIn, root, ns, table, cap,
        nBands, iters)
    }
  }

  /** Fold a delta into an auto-built index: dispatches on the
    * committed state itself (cluster-cap.json ⇒ the capped survivor
    * fold; otherwise the exact signature/pair append) — same disjoint-
    * doc_ids contract as both underlying refreshes. The marker is
    * cross-checked against the committed table versions (r16 advice):
    * a capped marker without committed survivors, or committed exact
    * signatures beside a capped marker, is mixed state from an
    * interrupted build — fail loudly instead of refreshing orphaned
    * state.
    */
  def refreshClusterIndexAuto(spark: SparkSession, delta: DataFrame,
      root: String, ns: String, table: String,
      iters: Int = ClusterIters): Unit = {
    import graft.plans.TableIO
    val capFile = TableIO.tableDir(root, ns, s"${table}_surv")
      .resolve("cluster-cap.json")
    val hasMarker = java.nio.file.Files.isRegularFile(capFile)
    val survV = TableIO.currentVersion(root, ns, s"${table}_surv")
    val sigV = TableIO.currentVersion(root, ns, s"${table}_sig")
    require(!(hasMarker && (survV == 0L || sigV > 0L)) &&
        !(!hasMarker && survV > 0L),
      s"$ns.$table is in MIXED cluster-index state (capped marker: " +
        s"$hasMarker, surv version: $survV, sig version: $sigV) — an " +
        "interrupted build left inconsistent tables; drop the index " +
        "tables and rebuild")
    if (hasMarker)
      refreshClusterIndexCapped(spark, delta, root, ns, table, iters)
    else refreshClusterIndex(spark, delta, root, ns, table, iters)
  }

  /** Labels from the committed survivor snapshot: survivor self-join
    * on (band, key) — pair volume ≤ buckets × cap² by construction —
    * then the same fixed-round propagation and publish as the exact
    * index. The pair set equals `Dedup.pairsFromSigsCapped` over the
    * union corpus's signatures, so the one capped-clusters oracle
    * covers build and refresh alike.
    */
  private def relabelClusterIndexCapped(spark: SparkSession, root: String,
      ns: String, table: String, iters: Int): Unit = {
    val surv = graft.CacheScope.cached(
      graft.plans.Mor.read(spark, root, ns, s"${table}_surv")
        .select("doc_id", "band", "key"))
    val pairs = graft.CacheScope.cached(
      Similarity.pairsAmongCapped(surv, "doc_a", "doc_b", unordered = true))
    // initial commit when no label snapshot exists yet (build, or the
    // out-of-step fallback healing an interrupted build), replacing
    // commit otherwise — decided from the committed state, not a flag,
    // so the fallback can never hit a replace-without-spec failure
    val replace = graft.plans.TableIO.currentVersion(root, ns, table) > 0L
    publishLabels(spark, root, ns, table, labelPropagation(pairs, iters),
      replace)
  }

  /** The committed (doc_id, cluster) labels — what every downstream
    * consumer (stats, splits, composites) reads instead of
    * reclustering.
    */
  def readClusterIndex(spark: SparkSession, root: String, ns: String,
      table: String): DataFrame =
    graft.plans.Mor.read(spark, root, ns, table)

  /** LABEL-level recall ledger for the capped cluster index (r17,
    * VERDICT r16 item 3) — the pair-level cap loss
    * (`ann_recall_eval_capped`) COMPOUNDS through the 3 propagation
    * rounds and, more brutally, through survivor eviction: a clone
    * group deeper than ~bands×cap keeps only its cap survivors in any
    * bucket, and evicted docs have NO capped pairs at all, hence no
    * label row — so a 300-deep group's true same-label pairs collapse
    * to the survivors' clique. This eval MEASURES that end-product
    * loss: on an adversarially dense text corpus (`copies` clones of
    * every `stride`-th document under fresh ids, base ids bounded by
    * `Similarity.MaxEvalBaseId` so the eval never scales with the
    * corpus), ground truth is the EXACT index's labels
    * (4×4 banding, full pair join — affordable on the bounded
    * sample), and each (banding, cap) config's capped labels are
    * scored by the fraction of true same-label pairs they keep
    * together. Counting is all grouped-integer arithmetic — true
    * pairs = Σ g(g−1)/2 over exact-label group sizes, kept pairs =
    * Σ c(c−1)/2 over (exact-label, capped-label) cell sizes, with
    * unlabeled docs sentineled to a per-doc value so they never pair
    * — no pair enumeration, and the oracle replays it exactly.
    * Expected shape of the results (the honest text-side story the
    * r17 BandShapeProbe measured): clone groups collide at ANY band
    * width, so the re-banded 2×8 configs can only do WORSE than 4×4
    * here (half the independent cap draws) — which is exactly why
    * the shape-aware router refuses to re-band on clone-dense text.
    */
  /** The eval's default knobs — NAMED (r17 advice) so the oracle SQL
    * interpolates them instead of hardcoding its own copies. `copies`
    * dieted 10 → 5 in r18 (VERDICT r17 item 3: the eval was the
    * suite's heaviest query at 23–28s): the 6 ledger rows and their
    * story are unchanged — at clone depth 5, like depth 10, every
    * config sits at recall 1.0 because connectivity needs far fewer
    * pairs than bands×cap keeps; the LOSS regime needs groups deeper
    * than bands×cap, which the spec pins with its explicit 30-deep
    * fixture — while the synthesized corpus, its truth pair join
    * (quadratic in clone depth), and the 7-config propagation all
    * shrink.
    */
  val LabelRecallCopies = 5
  val LabelRecallStride = 10
  val LabelRecallCaps: Seq[Int] = Seq(4, 8, 16)

  def clusterLabelRecallEval(docs: DataFrame,
      caps: Seq[Int] = LabelRecallCaps,
      copies: Int = LabelRecallCopies, stride: Int = LabelRecallStride,
      iters: Int = ClusterIters): DataFrame = {
    import docs.sparkSession.implicits._
    val dense = graft.CacheScope.cached(
      docs.filter(pmod(col("doc_id"), lit(stride.toLong)) === 0L &&
          col("doc_id") < lit(Similarity.MaxEvalBaseId))
        .select(col("doc_id"), col("text"),
          explode(array((0 until copies).map(lit): _*)).as("c"))
        .select((col("doc_id") * copies + col("c")).as("doc_id"),
          col("text")))
    // SINGLE-PARTITION caches + EAGER materialization (r18, the eval's
    // measured cost anatomy): the corpus is BOUNDED by construction
    // (base ids under MaxEvalBaseId), but the relation carried the
    // session's 32 shuffle partitions into every cached scan — and the
    // plan reads `sig` from ~6 independent branches and `edges` from 6
    // more (3 rounds × 2 union arms), each an AQE-materialized
    // exchange of 32 near-empty map tasks. ~70 such exchange jobs ×
    // ~33 tiny tasks was the wall (sum-of-job-walls ~8× wall clock;
    // per-task overhead, not data). Caching the bounded relations at
    // ONE partition makes every downstream stage 1-2 tasks, and the
    // eager counts populate each cache in dependency order so AQE's
    // parallel branch materialization never races the unpopulated
    // cache (measured: those races serialized on the cache's block
    // locks, re-running the shingle pipeline per branch). The shingle
    // hashing itself still runs wide — the coalesce sits above
    // minhashSignatures' internal repartition.
    val sig = graft.CacheScope.cached(
      Dedup.minhashSignatures(dense).coalesce(1))
    sig.count()
    // ONE config-tagged pair relation — truth plus all 6 capped
    // configs — so the whole eval pays ONE 3-round propagation, not
    // 7 (the first cut ran 7 chains and cost 44s of pure per-job
    // scheduling overhead on a 500-doc corpus). Per banding, one
    // ranked window pass scores every cap at once: a pair survives
    // cap c iff min over shared buckets of max(bn_a, bn_b) <= c,
    // which is exactly membership in pairsFromSigsCapped(sig, c, nb)
    // (both sides ranked within cap in some common bucket).
    val capMax = caps.max
    val cappedPairs = Seq(4, 2).map { nb =>
      val ranked = Similarity.rankBuckets(
        Dedup.sigBands(sig, nb), "doc_id", lit(0L))
        .filter(col("bn") <= capMax)
        .select("doc_id", "band", "key", "bn")
      val a = ranked.toDF("doc_a", "band", "key", "bn_a")
      val b = ranked.toDF("doc_b", "band", "key", "bn_b")
      // no explicit repartition: the eval corpus is bounded (base ids
      // under MaxEvalBaseId), so AQE's defaults beat an extra shuffle
      a.join(b, Seq("band", "key"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(min(greatest(col("bn_a"), col("bn_b"))).as("mm"))
        .select(col("doc_a"), col("doc_b"),
          explode(array(caps.map(lit): _*)).as("cap"))
        .filter(col("mm") <= col("cap"))
        .select(lit(s"${nb}x${16 / nb}").as("banding"), col("cap"),
          col("doc_a"), col("doc_b"))
    }.reduce(_ unionByName _)
    val truthPairs = Dedup.pairsFromSigs(sig)
      .select(lit("truth").as("banding"), lit(0).as("cap"),
        col("doc_a"), col("doc_b"))
    val pairs = truthPairs.unionByName(cappedPairs)
    // min-label propagation, partitioned by config — the same fixed
    // rounds as labelPropagation, over every config at once, in its
    // self-loop single-reference form (see labelPropagation: one
    // reference to the previous labels per round keeps the plan AND
    // the execution linear in rounds — the least()-formulation over
    // this 7-config edge relation cost ~30s of replanning and round
    // re-execution)
    val edges = graft.CacheScope.cached(
      pairs.select(col("banding"), col("cap"),
          col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("banding"), col("cap"),
          col("doc_b").as("src"), col("doc_a").as("dst")))
        .coalesce(1))
    // eager + single-partition for the same reason: every propagation
    // round reads edges from two plan positions (withSelf's union
    // arms), ×3 rounds
    edges.count()
    // no distinct on the self-loops — harmless dupes under min, one
    // fewer shuffle (see labelPropagation)
    val withSelf = edges.union(edges
      .select(col("banding"), col("cap"), col("src"),
        col("src").as("dst")))
    var labels = edges.select(col("banding"), col("cap"),
        col("src").as("doc_id")).distinct()
      .withColumn("lab", col("doc_id"))
    for (_ <- 1 to iters) {
      labels = withSelf
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("lab", "dlab"),
          Seq("banding", "cap", "dst"))
        .groupBy("banding", "cap", "src")
        .agg(min("dlab").as("lab"))
        .withColumnRenamed("src", "doc_id")
    }
    val labC = graft.CacheScope.cached(labels)
    val truthLab = labC.filter(col("banding") === "truth")
      .select(col("doc_id"), col("lab").as("cluster"))
    // Σ g(g-1) is even; halve with INTEGER `div` (r17 advice: `/` is
    // double division in Spark — exact only below 2^53, whereas the
    // DuckDB oracle's `// 2` is integer at any magnitude)
    val nTrue = truthLab.groupBy("cluster").agg(count(lit(1)).as("g"))
      .agg(coalesce(sum(col("g") * (col("g") - 1)), lit(0L)).as("tp2"))
      .select(expr("tp2 div 2").as("n_true_pairs"))
    val configsDf = (for (nb <- Seq(4, 2); cap <- caps)
      yield (s"${nb}x${16 / nb}", cap)).toDF("banding", "cap")
    val cells = truthLab.crossJoin(configsDf)
      .join(labC.withColumnRenamed("lab", "clab"),
        Seq("banding", "cap", "doc_id"), "left")
      .select(col("banding"), col("cap"), col("cluster"),
        // docs the capped index never labeled must never pair:
        // sentinel below any real label (labels are doc_ids >= 0)
        coalesce(col("clab"), -(col("doc_id") + 1)).as("clab"))
      .groupBy("banding", "cap", "cluster", "clab")
      .agg(count(lit(1)).as("c"))
      .groupBy("banding", "cap")
      .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).as("sp2"))
    configsDf.join(cells, Seq("banding", "cap"), "left")
      .select(col("banding"), col("cap"),
        expr("coalesce(sp2, 0L) div 2").as("n_same_label"))
      .crossJoin(broadcast(nTrue))
      .select(col("banding"), col("cap"), col("n_true_pairs"),
        col("n_same_label"),
        when(col("n_true_pairs") === 0, lit(null).cast("double"))
          .otherwise(col("n_same_label").cast("double")
            / col("n_true_pairs")).as("label_recall"))
      .orderBy("banding", "cap")
  }

  /** Deterministic round-robin interleave of corpus sources — the
    * training-order step after per-source curation: document i of each
    * source lands at global position `(i-1) * n_sources + source_rank`,
    * so a training run cycles through sources instead of consuming
    * them sequentially. Pure arithmetic over per-source row numbers
    * plus one tiny broadcast of the source ranking — no global sort,
    * no unpartitioned window (the position IS the sort key; a sink
    * that needs physical order range-partitions on it). Interleaves
    * the WHOLE corpus: any presentation bound (the query registry's
    * top-100, a preview head) belongs to the consumer, not the
    * operator (r16 verdict nit — the bound used to live here, making
    * the library function silently a top-100).
    */
  def interleave(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcRank = docs.select(col("source")).distinct()
      .withColumn("src_rank",
        row_number().over(Window.orderBy("source")))
    val n = srcRank.count()
    val rn = docs.select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("doc_id")))
    rn.join(broadcast(srcRank), "source")
      .select(col("doc_id"), col("source"),
        ((col("rn") - 1) * lit(n) + col("src_rank")).as("pos"))
      .orderBy("pos")
  }

  /** Weight-proportional systematic sampling: pick ~`k` documents with
    * inclusion probability proportional to size (n_chars), by walking
    * the cumulative-weight axis and taking the document under every
    * multiple of step = totalW/k. Deterministic and ALL-INTEGER — no
    * float `pow(u, 1/w)` keys whose libm rounding could diverge across
    * engines — which is why this classic survey-sampling design
    * (systematic PPS) is the reproducible choice for corpus
    * subsampling; A-ES reservoir keys give the same marginal
    * probabilities but float-order sensitivity.
    *
    * The cumulative weight is the two-level distributed prefix sum
    * ([[tokenBudget]]): per-(bucket) window over `doc_id div 512`
    * buckets (monotone in the walk order) plus a window over
    * per-bucket totals — no single task sorts the corpus. A document
    * heavier than `step` is taken once (the standard systematic-PPS
    * caveat), so the output size can undershoot k on degenerate
    * weight skew; the sampled row carries its cum position for audit.
    */
  def weightedSample(docs: DataFrame, k: Int = 50,
      bucketWidth: Long = 512L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = docs.select(col("doc_id"), col("n_chars"))
      .withColumn("bucket", expr(s"doc_id div $bucketWidth"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = b.withColumn("cum_in", sum("n_chars").over(wIn))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = b.groupBy("bucket").agg(sum("n_chars").as("tot"))
      .withColumn("off", coalesce(sum("tot").over(wOff), lit(0L)))
      .select("bucket", "off")
    val tot = docs.agg(sum("n_chars").as("total"))
    intra.join(offs, "bucket")
      .crossJoin(broadcast(tot))
      .withColumn("cum", col("off") + col("cum_in"))
      .withColumn("step", greatest(expr(s"total div $k"), lit(1L)))
      .filter(expr("cum div step") > expr("(cum - n_chars) div step"))
      .select(col("doc_id"), col("n_chars"), col("cum"))
      .orderBy("doc_id")
  }

  /** [[weightedSample]] with an AUTO-SCALED bucket width (VERDICT r15
    * item 6): a fixed width leaves the bucket-offset window — the one
    * single-task frame in the decomposition — over idRange/width rows,
    * a straggler once the corpus passes ~10⁹ docs. Width
    * ceil(sqrt(idRange)) balances the two levels: the per-bucket
    * windows AND the offset window each see O(√idRange) rows, so no
    * single task ever holds more than the square root of the id space
    * whatever the corpus size. idRange is max−min+1, NOT max+1 (r16
    * review): an offset id space (snowflake-style ids starting at
    * ~10¹²) would otherwise yield a width of ~10⁶ that collapses the
    * corpus into a couple of giant buckets — the exact straggler this
    * function removes. One min/max guard aggregate picks the width;
    * the decomposition is exact for ANY width, so the result — and
    * the single-window oracle — are unchanged (spec-pinned).
    */
  def weightedSampleAuto(docs: DataFrame, k: Int = 50): DataFrame =
    weightedSample(docs, k, autoBucketWidth(docs))

  /** The one guard aggregate behind [[weightedSampleAuto]], exposed so
    * the spec can pin the picked width itself (the sampled rows are
    * width-invariant, so equality checks alone can't catch a bad
    * width).
    */
  private[graft] def autoBucketWidth(docs: DataFrame): Long = {
    val mm = docs.agg(min("doc_id"), max("doc_id")).head()
    if (mm.isNullAt(0)) 1L
    else math.max(1L, math.ceil(math.sqrt(
      (mm.getLong(1) - mm.getLong(0) + 1).toDouble)).toLong)
  }

  /** Oracle twin of [[weightedSample]]: the single-window cumulative
    * sum (bit-identical to the two-level decomposition).
    */
  def weightedSampleSql(k: Int = 50): String =
    s"""WITH w AS (SELECT doc_id, n_chars,
       |    CAST(sum(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum
       |  FROM documents),
       |t AS (SELECT greatest(CAST(sum(n_chars) AS BIGINT) // $k, 1)
       |        AS step FROM documents)
       |SELECT doc_id, n_chars, cum FROM w, t
       |WHERE cum // step > (cum - n_chars) // step
       |ORDER BY doc_id""".stripMargin

  /** Quality-ranked selection under a per-language token budget: rank
    * each language's documents (longest first — the stand-in for a
    * model-based quality score, deterministic tie-break on doc_id) and
    * keep documents while the running token total stays within budget —
    * "take the best docs up to N tokens per language", the selection
    * step between scoring and training-set assembly.
    *
    * The per-language running sum is computed as a two-level distributed
    * prefix sum so no task ever sorts a whole language (at 100 TB one
    * language can be most of the corpus): documents are bucketed by a
    * COARSENED quality score (`floor(n_chars / width)` — monotone in the
    * sort key, so bucket order respects global order and ties stay
    * inside one bucket), the only per-row window runs per
    * (lang, quality-bucket), and each bucket's global offset is a second
    * window over the per-bucket TOTALS — #langs x #buckets rows, not
    * corpus rows. `offset + intra-bucket cum` equals the single-window
    * running sum bit-for-bit; the DuckDB oracle pins the equivalence.
    */
  def tokenBudget(docs: DataFrame, budgetPerLang: Long = 20000L,
      qualityBucketWidth: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      size(split(trim(col("text")), "\\s+")).as("n_tok"))
      .withColumn("qb",
        floor(col("n_chars") / lit(qualityBucketWidth.toLong)).cast("long"))
    val wIn = Window.partitionBy("lang", "qb")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = scored.withColumn("cum_in", sum("n_tok").over(wIn))
    // tokens in strictly-better buckets = this bucket's global offset;
    // the frame is the per-(lang, bucket) aggregate, strata-sized
    val wOff = Window.partitionBy("lang").orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = intra.groupBy("lang", "qb")
      .agg(sum("n_tok").as("bucket_tok"))
      .withColumn("offset", coalesce(sum("bucket_tok").over(wOff), lit(0L)))
      .select("lang", "qb", "offset")
    intra.join(broadcast(offsets), Seq("lang", "qb"))
      .withColumn("cum", col("offset") + col("cum_in"))
      .filter(col("cum") <= budgetPerLang)
      .groupBy("lang").agg(
        count(lit(1)).as("n_selected"),
        sum("n_tok").as("total_tokens"),
        max("cum").as("budget_used"))
      .orderBy("lang")
  }

  /** Dataset-card census: the per-(source, language) summary a corpus
    * release publishes — document counts, char/token totals, length
    * extremes, and each stratum's share of the corpus. One grouped
    * aggregation plus a broadcast scalar for the share denominator;
    * shuffle rows = #strata regardless of corpus size.
    */
  def dataCard(docs: DataFrame): DataFrame = {
    val base = docs.select(col("source"), col("lang"), col("n_chars"),
      size(split(trim(col("text")), "\\s+")).as("n_tok"))
    val g = base.groupBy("source", "lang").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("total_chars"),
      sum("n_tok").as("total_tokens"),
      min("n_chars").as("min_chars"),
      max("n_chars").as("max_chars"))
    val tot = base.agg(count(lit(1)).as("corpus_docs"))
    g.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"), col("total_chars"),
        col("total_tokens"), col("min_chars"), col("max_chars"),
        round(col("n_docs").cast("double") / col("corpus_docs"), 6)
          .as("doc_share"))
      .orderBy("source", "lang")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for document corpora: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (100 TB): nothing here is O(N²). Exact dedup is a
  * hash groupBy (one shuffle on the digest). Near-dup candidate
  * generation goes through inverted-index / LSH-bucket joins whose
  * width is bounded (`maxDocFreq` caps hot shingles; LSH bands cap
  * bucket fan-out), so the only wide operations shuffle on
  * shingle/band hashes — never on document pairs.
  */
object Dedup {

  private val P = 2147483647L // 2^31-1, Mersenne prime for perm hashes

  /** Exact duplicate groups by content digest: survivor = min id —
    * deterministic, unlike "whichever row pandas kept".
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(md5(col(textCol).cast("binary")).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of the normalized text, as one
    * array column (per-row, no shuffle).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    // Guard short docs: sequence(1, 0) yields the DESCENDING array
    // [1, 0] (not empty), and slice(…, 0, …) then throws at runtime.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Candidate near-dup pairs by exact n-gram Jaccard over an
    * inverted shingle index. Shingles occurring in more than
    * `maxDocFreq` docs are dropped from the index (bounds the
    * self-join width on skewed corpora; part of the operator's
    * declared semantics).
    */
  def ngramJaccard(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      threshold: Double,
      maxDocFreq: Int
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // The repartition is a deliberate materialization boundary: the
    // shingle HOF expression would otherwise be inlined (and
    // recomputed) into the window, the set-size agg, AND both sides
    // of the self-join. It also pre-partitions by shingle, which the
    // doc-frequency window and the join key reuse. Shingles are
    // carried as xxhash64 longs, not strings: same equality
    // semantics (collision odds ~N²/2⁶⁵), a fraction of the shuffle
    // bytes and comparison cost.
    val exploded = docs
      .select(col(idCol).as("doc"),
        explode(transform(shingles(col(textCol), n), s => xxhash64(s))).as("sh"))
      .repartition(col("sh"))
    val setSizes = exploded.groupBy($"doc").agg(count(lit(1)).as("set_size"))
    val index = exploded
      .withColumn("df", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy($"sh")))
      .filter($"df" <= maxDocFreq)
      .drop("df")
    val pairs = index.as("a")
      .join(index.as("b"), $"a.sh" === $"b.sh" && $"a.doc" < $"b.doc")
      .groupBy($"a.doc".as("doc_a"), $"b.doc".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(setSizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("set_size", "size_a"), "doc_a")
      .join(setSizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("set_size", "size_b"), "doc_b")
      .withColumn("jaccard", round($"inter".cast("double") / ($"size_a" + $"size_b" - $"inter"), 4))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** The k (a, b) permutation constants for a given seed. Exposed to
    * `private[graft]` so the DuckDB oracle SQL can embed the SAME
    * constants as literals — the signature is then exactly
    * reproducible outside Spark.
    */
  private[graft] def permutations(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % P + 1, math.abs(rnd.nextLong()) % P))
  }

  /** Base shingle hashes: polynomial rolling hash of each distinct
    * n-gram (values in [0, 1e9+7) ⊂ [0, P)). RollingHash rather than
    * xxhash64 so the whole signature is expressible in the ANSI-SQL
    * oracle; the native expression is codegen'd, so this is also the
    * faster path.
    */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingles(text, n), s => graft.functions.RollingHash(s))

  /** MinHash signature from shingle hashes: k permutations
    * h_i(x) = (a_i·x + b_i) mod P, folded in ONE pass over the hash
    * set. `aggregate` evaluates its input collection exactly once per
    * row, so `hashes` may be an inline expression — no staging
    * boundary (and no shuffle) is needed to avoid re-shingling k
    * times. Empty hash sets fold to the all-P sentinel (P itself is
    * unreachable: (a·x+b) mod P < P).
    */
  def minhashFromHashes(hashes: Column, k: Int, seed: Long): Column = {
    val permArr = array(permutations(k, seed).map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    aggregate(
      hashes,
      array_repeat(lit(P), k),
      (acc, h) => zip_with(acc, permArr,
        (m, p) => least(m, (p.getField("a") * h + p.getField("b")) % P)))
  }

  /** One-shot signature (convenience; see [[minhashFromHashes]] for
    * the staged scale path).
    */
  def minhashSignature(text: Column, n: Int, k: Int, seed: Long): Column =
    minhashFromHashes(shingleHashes(text, n), k, seed)

  /** LSH candidate pairs: signatures banded (`bands` × `rowsPerBand`
    * = k); docs sharing any band bucket are candidates. Shuffle is
    * on (band, bucket-hash) only. Returns pairs with their
    * signature-agreement estimate of Jaccard.
    */
  def minhashLsh(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand

    // ONE map-only pass builds (doc, sig) via the native codegen'd
    // MinHashSig expression (same semantics as
    // minhashFromHashes∘shingleHashes, one tight loop instead of
    // interpreted HOF lambdas). The single materialization barrier is
    // an executor-local checkpoint — no network shuffle — read by
    // both self-join sides; ReuseExchange then dedups the one
    // (band, bucket) exchange the join needs. Net: ONE shuffle for
    // the whole operator (was three).
    // Docs shorter than n tokens have an EMPTY shingle set → the
    // all-P sentinel signature shared by every such doc → one
    // gigantic LSH bucket whose self-join is O(m²). They cannot be
    // near-dup candidates under this shingling, so drop them after
    // the checkpoint (a cheap stored-column predicate — no text
    // re-tokenization).
    val signed = docs
      .select(col(idCol).as("doc"),
        graft.functions.MinHashSig(col(textCol), n, k, seed).as("sig"))
      .localCheckpoint(true)
      .filter(col("sig")(0) < P)

    // Band bucket = rolling-hash fold of the band's signature slice
    // (not murmur3): same join semantics, reproducible in the SQL
    // oracle.
    val banded = signed.select(
      $"doc", $"sig",
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => aggregate(slice($"sig", b * rowsPerBand + 1, lit(rowsPerBand)),
            lit(0L), (acc, v) => (acc * 31 + v) % P))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val candidates = banded.as("a")
      .join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.doc" < $"b.doc")
      .select($"a.doc".as("doc_a"), $"b.doc".as("doc_b"), $"a.sig".as("sig_a"), $"b.sig".as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .withColumn("est_jaccard",
        round(aggregate(
          zip_with($"sig_a", $"sig_b", (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / k, 4))
      .select($"doc_a", $"doc_b", $"est_jaccard")
  }

  /** Number of SimHash bits: two independent 30-bit rolling hashes
    * (forward + reversed token) concatenated. 60 rather than 64 so
    * every intermediate stays overflow-free in BOTH Spark and the
    * ANSI-SQL oracle (no 64-bit wraparound to emulate).
    */
  val SimhashBits = 60

  /** 60-bit SimHash over token hashes, as a single higher-order
    * expression: per bit, sum +1/−1 votes across distinct tokens; bit
    * set if the vote is positive. No shuffle, no UDF. Token hash =
    * rolling(token) << 30 | rolling(reverse(token)) — reproducible in
    * the SQL oracle, unlike xxhash64.
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(split(lower(trim(text)), "\\s+"))
    val hashes = transform(toks, t =>
      shiftleft(graft.functions.RollingHash(t), 30)
        .bitwiseOR(graft.functions.RollingHash(reverse(t))))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), SimhashBits),
      (acc, h) =>
        zip_with(acc, sequence(lit(0), lit(SimhashBits - 1)),
          (a, bit) => a + when(call_function("shiftright", h, bit.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(SimhashBits - 1)),
        (v, bit) => when(v > 0, call_function("shiftleft", lit(1L), bit.cast("int"))).otherwise(0L)),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Connected components over near-dup pairs → dedup groups: each
    * node labeled with the minimum doc id reachable from it.
    *
    * Min-label propagation with a driver-side convergence loop —
    * each iteration is one join+agg (shuffle on node id); iterations
    * scale with graph diameter, which for near-dup clusters is tiny
    * (dup groups are cliques or near-cliques). For adversarial
    * long-chain graphs swap in large-star/small-star; the API stays
    * the same.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Materialize the pair source ONCE: `pairs` is referenced by both
    // union branches, so an expensive upstream (the Jaccard candidate
    // pipeline) would run twice before the edges cache ever fills.
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b")).localCheckpoint(true)
    val edges = p
      .select($"a".as("src"), $"b".as("dst"))
      .union(p.select($"b".as("src"), $"a".as("dst")))
      .distinct()
      .cache()
    // localCheckpoint (not cache) each iteration: `labels` is
    // referenced twice per step, so without lineage truncation the
    // logical plan DOUBLES every iteration — exponential planning
    // cost by ~iteration 10.
    var labels = edges.select($"src".as("node")).distinct()
      .withColumn("component", $"node")
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst").withColumnRenamed("component", "dst_comp"), "dst")
        .groupBy($"src".as("node"))
        .agg(min($"dst_comp").as("nbr_comp"))
      val updated = labels
        .join(neighborMin, Seq("node"), "left")
        .select($"node",
          least($"component", coalesce($"nbr_comp", $"component")).as("component"))
        .localCheckpoint(true)
      val changes = updated.as("u")
        .join(labels.as("l"), "node")
        .filter($"u.component" =!= $"l.component")
        .count()
      labels = updated
      converged = changes == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }
}

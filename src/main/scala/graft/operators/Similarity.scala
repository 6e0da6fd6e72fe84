package graft.operators

import graft.functions.VectorFunctions
import graft.io.Parallelism
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three strategies, in ascending scale:
  *
  *   - [[bruteForceTopK]]: exact top-k for a (small) query set against the
  *     corpus. The query side is broadcast, so the corpus is scanned once
  *     with no shuffle of vectors; the only shuffle is the per-query top-k
  *     (rows = |queries|·|corpus| reduced map-side by the window's
  *     rank pushdown — in practice bound k·|queries| per partition after
  *     partial sort). Correct baseline + the verifier for the ANN paths.
  *
  *   - [[ivfTopK]]: IVF-style — assign every corpus vector to its nearest
  *     centroid (map-side vs broadcast centroids), search only the probed
  *     cells. Cuts the scanned fraction to nprobe/ncells; exactness is
  *     traded per standard IVF semantics.
  *
  *   - [[lshBuckets]]: random-hyperplane (SRP) bucketing for cosine space —
  *     vectors in the same bucket are near-dup candidates. Deterministic
  *     hyperplanes derived from a seed so results are reproducible.
  */
object Similarity {
  import graft.functions.expressions.{CentroidModel, NearestCentroid, NearestCentroidGrouped}
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Literal-vs-broadcast switch point, in centroid COMPONENTS (k·dim).
    * Below it, centroids embed as literals (constant-folded norms, zero
    * per-row indirection — the best plan when the expression tree is
    * small). Above it, the literal tree's CODEGEN size becomes the
    * bottleneck (64 KB JVM method limit at k·dim ≈ tens of thousands;
    * SemDeDup's k = ⌈√n⌉ crosses that around n ≈ 10⁷ at dim 32), so the
    * matrix ships once as a broadcast variable consumed by
    * [[NearestCentroid]] — same math, same hashes, O(1) codegen. */
  val BroadcastThreshold: Int = 16384

  /** Build the broadcast [[CentroidModel]] for (id, vec) centroid rows,
    * ids ascending (the argmin tie order), floats widened exactly. */
  private def centroidModel(
      rows: Array[(Int, Seq[Number])], useCosine: Boolean): CentroidModel = {
    val sorted = rows.sortBy(_._1)
    val dim = sorted.head._2.length
    val flat = new Array[Double](sorted.length * dim)
    var j = 0
    while (j < sorted.length) {
      val v = sorted(j)._2
      var d = 0
      while (d < dim) { flat(j * dim + d) = v(d).doubleValue(); d += 1 }
      j += 1
    }
    CentroidModel(sorted.map(_._1), flat, dim, useCosine)
  }

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, vec). Self-matches excluded. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    // Norms precomputed per side — the O(|q|·|corpus|) scoring loop then
    // only does the dot product (bit-identical result, 3× fewer flops).
    // NOTE: the final top-k window partitions by query_id, so reduce-side
    // parallelism is bounded by |queries| — fine for this operator's
    // documented exact-verifier role (small query sets); large query
    // workloads should route through ivfTopK/ivfPqTopK, whose scans
    // parallelize by corpus partition.
    val c = Parallelism.ensure(corpus).select(col(idCol).as("corpus_id"), col(vecCol).as("c_vec"),
      VectorFunctions.norm(col(vecCol)).as("c_nrm"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      VectorFunctions.norm(col(vecCol)).as("q_nrm"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        when(col("q_nrm") === 0.0 || col("c_nrm") === 0.0, lit(0.0))
          .otherwise(VectorFunctions.dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** IVF cell assignment: nearest centroid id (by cosine) for every vector.
    * `centroids`: (centroid_id, vec) — k·dim values, collected once to the
    * driver and re-shipped as literals (exactly the bytes a broadcast would
    * move), so assignment is PURE MAP-SIDE: the nearest cell is the
    * lexicographic `array_min` over (−cosine, centroid_id) structs — same
    * winner as "ORDER BY cosine DESC, centroid_id ASC", same fp tree per
    * cosine, no exchange of any kind. A previous formulation cross-joined
    * the corpus with the centroids and picked rn=1 under a
    * Window.partitionBy(id) — a full hash shuffle of k× the corpus rows,
    * which at 100 TB turns an index build from map-only into an 8×
    * full-data exchange. Negation is order-reversing for doubles (signed
    * zeros included), so argmin(−sim) ≡ argmax(sim) with ties to the lower
    * centroid id. */
  def assignCells(
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      broadcastThreshold: Int = BroadcastThreshold
  ): DataFrame = {
    val rows = centroids
      .select(col("centroid_id").cast("int"), col(vecCol))
      .collect()
    val cellExpr: Column =
      if (rows.isEmpty) lit(null).cast("int") // degenerate: no cells, all −1
      else if (rows.length.toLong * rows.head.getSeq[Any](1).length <= broadcastThreshold) {
        val cents: Seq[(Int, Column)] = rows
          .map { r =>
            // preserve the element runtime type (float stays float) so the
            // cosine expression tree is bit-identical to the joined form
            val arr = r.getSeq[Any](1).map {
              case f: java.lang.Float  => lit(f.floatValue())
              case d: java.lang.Double => lit(d.doubleValue())
              case x                   => lit(x)
            }
            (r.getInt(0), array(arr: _*))
          }
          .sortBy(_._1).toSeq
        val scored = array(cents.map { case (cid, centArr) =>
          struct((-VectorFunctions.cosine(col("vec"), centArr)).as("neg_sim"),
            lit(cid).as("cid"))
        }: _*)
        array_min(scored).getField("cid")
      } else {
        // k·dim past the codegen comfort zone: one broadcast, O(1) codegen,
        // bit-identical argmin (spec- and oracle-gated vs the literal path).
        val model = centroidModel(
          rows.map(r => (r.getInt(0), r.getSeq[Number](1))), useCosine = true)
        val bc = corpus.sparkSession.sparkContext.broadcast(model)
        column(NearestCentroid(expression(col("vec")), bc))
      }
    // coalesce(…, -1) makes the cell key NON-NULLABLE, so downstream
    // equi-joins on it infer no isnotnull(cell) filter — without this,
    // InferFiltersFromConstraints inlines the whole argmin expression
    // into a Filter conjunct below the probe join and evaluates it twice
    // per row (the q38 plan nit). Semantics unchanged: only a null vec
    // produces a null argmin, and cell −1 matches no probe, exactly like
    // the null key it replaces.
    Parallelism.ensure(corpus).select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cell", coalesce(cellExpr, lit(-1)))
      .select(col("id"), col("vec"), col("cell"))
  }

  /** IVF top-k: search only the `nprobe` cells nearest to each query.
    * Returns (query_id, corpus_id, cosine, rank) like the brute force. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      broadcastThreshold: Int = BroadcastThreshold
  ): DataFrame = {
    val cells = assignCells(corpus, centroids, idCol, vecCol, broadcastThreshold)
    val c = centroids.select(col("centroid_id"), col(vecCol).as("cent_vec"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(c))
      .withColumn("csim", VectorFunctions.cosine(col("q_vec"), col("cent_vec")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      // greatest(c, c) ≡ c, but constraint inference can't derive ranges
      // through it: without the launder, any predicate on the centroid
      // source (e.g. `vec_id < 8` building the centroids) propagates
      // through the equi-join onto the corpus' cell key and inlines the
      // WHOLE argmin expression into a scan filter — evaluating cell
      // assignment twice per corpus row for a predicate that is true by
      // construction (cells are 0..k−1). Probe side is nprobe·|queries|
      // rows; the laundering costs nothing.
      .select(col("query_id"), col("q_vec"),
        greatest(col("centroid_id"), col("centroid_id")).as("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("id").asc)
    cells.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", VectorFunctions.cosine(col("q_vec"), col("vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("corpus_id"), col("cosine"), col("rank"))
  }

  /** Deterministic distributed k-means (Lloyd's) for IVF centroid training.
    *
    * Distributed shape: the DATA never moves — each iteration is one
    * map-side assignment against the k·dim centroid matrix (tiny, shipped
    * as literals exactly like a broadcast) plus one groupBy(cell) average;
    * only k·dim doubles ever reach the driver. That is the textbook
    * k-means-on-MapReduce layout and it holds at 100 TB (centroid state is
    * independent of corpus size).
    *
    * Determinism (what makes it oracle-verifiable, no RNG anywhere):
    *   - init = the vectors of the k smallest ids;
    *   - per-dimension centroid means are rounded to 6 dp each iteration
    *     (grouped-avg summation order is engine/partitioning-dependent at
    *     ~1e-13; rounding quashes it);
    *   - distances fold sequentially over dimensions (same fp order as the
    *     oracle's list_reduce);
    *   - argmin ties break on the lower centroid id.
    */
  def kmeansAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      broadcastThreshold: Int = BroadcastThreshold
  ): DataFrame =
    kmeansFit(corpus, idCol, vecCol, k, iters, broadcastThreshold)._1

  /** [[kmeansAssign]] plus the trained k·dim centroid matrix itself (the
    * part [[ProductQuant]] codebook training needs). Identical math.
    *
    * Above `broadcastThreshold` (k·dim components) the per-iteration
    * assignment uses the broadcast [[NearestCentroid]] expression instead
    * of a k-literal tree, and the grouped means fold through ONE
    * `treeAggregate` over dense k×dim partial-sum arrays instead of a
    * posexplode + groupBy + k·dim-row collect: the per-iteration driver
    * round-trip is exactly the k·dim doubles of model state (one compact
    * array), there is no shuffle at all, and codegen size is O(1) in k.
    * Same 6-dp-rounded means (summation-order noise is ~1e-13, the
    * rounding's whole job), so hashes are unchanged — q133/q134 replay
    * q68/q87's oracles through this path with the threshold forced to 0. */
  def kmeansFit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      broadcastThreshold: Int = BroadcastThreshold
  ): (DataFrame, Seq[Seq[Double]]) = {
    val spark = corpus.sparkSession
    // an already-cached corpus (semanticNearDupsAuto's sizing count) is
    // reused as-is — re-caching would hold the working set twice
    val pre = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val base =
      if (corpus.storageLevel != org.apache.spark.storage.StorageLevel.NONE) pre
      else Parallelism.ensure(pre).cache()

    def sqDistTo(cent: Seq[Double]): Column = {
      val centArr = array(cent.map(lit): _*)
      aggregate(
        zip_with(col("vec"), centArr, (x, c) => {
          val d = x.cast("double") - c
          d * d
        }),
        lit(0.0), (acc, v) => acc + v)
    }

    def useBroadcast(cents: Seq[Seq[Double]]): Boolean =
      cents.length.toLong * cents.head.length > broadcastThreshold

    // cell = id of the nearest centroid, ties to the lower id — computed as
    // the lexicographic min of (dist_i, i) structs (literal path) or the
    // bit-identical broadcast argmin (scale path).
    def withCell(cents: Seq[Seq[Double]]): DataFrame = {
      val cellExpr =
        if (!useBroadcast(cents)) {
          val scored = array(cents.zipWithIndex.map { case (c, i) =>
            struct(sqDistTo(c).as("d"), lit(i).as("cid"))
          }: _*)
          array_min(scored).getField("cid")
        } else {
          val model = centroidModel(
            cents.zipWithIndex.map { case (c, i) =>
              (i, c.map(x => x: Number))
            }.toArray, useCosine = false)
          val bc = spark.sparkContext.broadcast(model)
          column(NearestCentroid(expression(col("vec")), bc))
        }
      base.withColumn("cell", cellExpr)
    }

    // explicit double-math rounding (floor(x·1e6 + 0.5)/1e6) — the same fp
    // expression tree the oracle runs, unlike round()'s decimal semantics
    val round6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    // element type is whatever the caller's vectors carry (float embeddings,
    // double residuals) — round6 normalizes either to the oracle's init
    var centroids: Seq[Seq[Double]] = base.orderBy(col("id")).limit(k).collect()
      .map(r => r.getSeq[Number](r.fieldIndex("vec")).map(x => round6(x.doubleValue())).toSeq).toSeq

    for (_ <- 1 to iters) {
      val assigned = withCell(centroids)
      val dim = centroids.head.length
      val byCell: Map[Int, Seq[Double]] =
        if (useBroadcast(centroids)) {
          // dense partial-sum fold: each partition accumulates k×dim sums +
          // k counts, partials combine pairwise — no exchange, no Row
          // overhead on the driver, exactly k·dim doubles come back.
          // Fp note: both paths divide sum/count then round6 (Spark's avg
          // IS sum/count), but the SUMMATION order differs (treeAggregate
          // combine tree vs avg's partial merge) — a mean landing exactly
          // on a .5×10⁻⁶ boundary could round apart. That set is
          // measure-zero for real embeddings; bit-equality of the two
          // paths is asserted empirically (spec + q133/q134 oracles), not
          // structurally guaranteed.
          val (sums, cnts) = assigned.select(col("cell"), col("vec")).rdd
            .treeAggregate((new Array[Double](k * dim), new Array[Long](k)))(
              seqOp = { (acc, row) =>
                if (!row.isNullAt(0) && !row.isNullAt(1)) {
                  val cell = row.getInt(0)
                  val v = row.getSeq[Number](1)
                  var d = 0
                  while (d < dim) { acc._1(cell * dim + d) += v(d).doubleValue(); d += 1 }
                  acc._2(cell) += 1L
                }
                acc
              },
              combOp = { (a, b) =>
                var i = 0
                while (i < k * dim) { a._1(i) += b._1(i); i += 1 }
                var j = 0
                while (j < k) { a._2(j) += b._2(j); j += 1 }
                a
              })
          (0 until k).iterator.filter(cnts(_) > 0).map { i =>
            i -> (0 until dim).map(d => round6(sums(i * dim + d) / cnts(i))).toSeq
          }.toMap
        } else {
          val means = assigned
            .select(col("cell"), posexplode(col("vec")).as(Seq("d", "x")))
            .groupBy(col("cell"), col("d"))
            .agg((floor(avg(col("x").cast("double")) * 1e6 + 0.5) / 1e6).as("m"))
            .collect().map(r => (r.getAs[Int]("cell"), r.getAs[Int]("d"), r.getAs[Double]("m")))
          means.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
        }
      // empty cells keep their previous centroid (no reseeding — determinism)
      centroids = centroids.indices.map(i => byCell.getOrElse(i, centroids(i)))
      require(centroids.forall(_.length == dim))
    }
    // carry vec through the assignment: it is already present map-side,
    // and downstream pair-scoring (semanticNearDups) would otherwise have
    // to RE-JOIN the corpus on id — a full corpus exchange for a column
    // the assignment never dropped.
    (withCell(centroids).select(col("id"), col("vec"), col("cell")), centroids)
  }

  /** Train INDEPENDENT k-means models — one per value of `grpCol` — in a
    * single chained job per iteration. Same math as [[kmeansFit]] run per
    * group (same smallest-id init, sequential-fold distances, 6-dp rounded
    * means, lower-id ties; the DuckDB replay is the identical grp-keyed
    * CTE chain), but ONE assignment scan + ONE grouped-mean shuffle covers
    * every group per iteration instead of |groups| sequential trainings
    * with |groups|× the blocking driver round-trips. This is what makes
    * m-subspace PQ training cost the same wall-clock as a single k-means —
    * measured 6.2 s → ~2 s for the residual IVF-PQ build at sf0.1.
    *
    * `corpus`: (grpCol, idCol, vecCol) — groups may have different vector
    * dimensions only if equal-length per group (dims are never mixed
    * across a mean). Returns grp → trained centroid matrix. */
  def kmeansFitGrouped(
      corpus: DataFrame,
      grpCol: String,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      broadcastThreshold: Int = BroadcastThreshold
  ): Map[Int, Seq[Seq[Double]]] = {
    val spark = corpus.sparkSession
    val base = Parallelism.ensure(
      corpus.select(col(grpCol).cast("int").as("grp"), col(idCol).as("id"),
        col(vecCol).as("vec"))).cache()

    def sqDistTo(cent: Seq[Double]): Column = {
      val centArr = array(cent.map(lit): _*)
      aggregate(
        zip_with(col("vec"), centArr, (x, c) => {
          val d = x.cast("double") - c
          d * d
        }),
        lit(0.0), (acc, v) => acc + v)
    }

    def useBroadcast(cents: Map[Int, Seq[Seq[Double]]]): Boolean =
      cents.valuesIterator.map(cs => cs.length.toLong * cs.head.length).sum > broadcastThreshold

    def withCell(cents: Map[Int, Seq[Seq[Double]]]): DataFrame = {
      val cellExpr =
        if (!useBroadcast(cents)) {
          cents.keys.toSeq.sorted.map { g =>
            val scored = array(cents(g).zipWithIndex.map { case (c, i) =>
              struct(sqDistTo(c).as("d"), lit(i).as("cid"))
            }: _*)
            g -> array_min(scored).getField("cid")
          }.foldRight(lit(-1): Column) { case ((g, e), els) =>
            when(col("grp") === g, e).otherwise(els)
          }
        } else {
          // Σ k·dim past the codegen comfort zone (the when-chain carries
          // EVERY group's literals): one broadcast map of per-group models,
          // same per-group argmin, unknown group → −1 like the chain.
          val models = cents.map { case (g, cs) =>
            g -> centroidModel(
              cs.zipWithIndex.map { case (c, i) => (i, c.map(x => x: Number)) }.toArray,
              useCosine = false)
          }
          val bc = spark.sparkContext.broadcast(models)
          column(NearestCentroidGrouped(
            expression(col("grp")), expression(col("vec")), bc))
        }
      base.withColumn("cell", cellExpr)
    }

    val round6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    // init: the k smallest ids per group (one job for all groups)
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    var centroids: Map[Int, Seq[Seq[Double]]] = base
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .orderBy(col("grp"), col("__rn"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Number](r.fieldIndex("vec"))
        .map(x => round6(x.doubleValue())).toSeq))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    for (_ <- 1 to iters) {
      val assigned = withCell(centroids)
      val byGrpCell: Map[(Int, Int), Seq[Double]] =
        if (useBroadcast(centroids)) {
          // keyed dense partial-sum fold (the kmeansFit treeAggregate with a
          // (grp, cell) key): no posexplode, no shuffle, Σ k·dim doubles back.
          val dims: Map[Int, Int] = centroids.map { case (g, cs) => g -> cs.head.length }
          type Acc = scala.collection.mutable.HashMap[(Int, Int), (Array[Double], Array[Long])]
          val folded = assigned.select(col("grp"), col("cell"), col("vec")).rdd
            .treeAggregate(new Acc)(
              seqOp = { (acc, row) =>
                if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
                  val key = (row.getInt(0), row.getInt(1))
                  val dim = dims(key._1)
                  val slot = acc.getOrElseUpdate(key, (new Array[Double](dim), new Array[Long](1)))
                  val v = row.getSeq[Number](2)
                  var d = 0
                  while (d < dim) { slot._1(d) += v(d).doubleValue(); d += 1 }
                  slot._2(0) += 1L
                }
                acc
              },
              combOp = { (a, b) =>
                b.foreach { case (key, (s, n)) =>
                  val slot = a.getOrElseUpdate(key, (new Array[Double](s.length), new Array[Long](1)))
                  var d = 0
                  while (d < s.length) { slot._1(d) += s(d); d += 1 }
                  slot._2(0) += n(0)
                }
                a
              })
          folded.iterator.map { case (key, (s, n)) =>
            key -> s.indices.map(d => round6(s(d) / n(0))).toSeq
          }.toMap
        } else {
          val means = assigned
            .select(col("grp"), col("cell"), posexplode(col("vec")).as(Seq("d", "x")))
            .groupBy(col("grp"), col("cell"), col("d"))
            .agg((floor(avg(col("x").cast("double")) * 1e6 + 0.5) / 1e6).as("m"))
            .collect()
            .map(r => (r.getInt(0), r.getAs[Int]("cell"), r.getAs[Int]("d"), r.getAs[Double]("m")))
          means.groupBy(m => (m._1, m._2))
            .view.mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap
        }
      // empty cells keep their previous centroid — per group, like kmeansFit
      centroids = centroids.map { case (g, cs) =>
        g -> cs.indices.map(i => byGrpCell.getOrElse((g, i), cs(i))).toSeq
      }
    }
    base.unpersist()
    centroids
  }

  /** IVF top-k under a metadata predicate — "filtered vector search".
    * The predicate applies to the CORPUS side *below* cell assignment, so
    * it reaches the parquet scan as a pushed filter (graph indexes
    * famously struggle with filtered ANN — an IVF scan layout gets it by
    * construction: prune cells, then prune rows, then score). Recall
    * caveat vs post-filtering: cells are still probed by query-centroid
    * distance over the FULL corpus's trained centroids, so a highly
    * selective predicate can leave fewer than k matches in the probed
    * cells — raise nprobe for selective filters. */
  def ivfTopKWhere(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      pred: Column,
      broadcastThreshold: Int = BroadcastThreshold
  ): DataFrame =
    ivfTopK(corpus.filter(pred), queries, centroids, idCol, vecCol, k, nprobe,
      broadcastThreshold)

  /** SemDeDup-style semantic near-dup pairs: k-means cells prune the
    * candidate space — only pairs sharing a cell are cosine-scored, so the
    * all-pairs O(n²) collapses to Σ|cell|² (~n²/k for balanced cells, and
    * k grows with the corpus). Cross-cell near-dups are missed BY DESIGN;
    * that is the SemDeDup recall trade, and it is what makes semantic
    * dedup feasible at 100 TB where exact all-pairs cannot run. Training
    * and assignment are [[kmeansAssign]] (deterministic, oracle-replayable)
    * and verification is the exact cosine with precomputed norms — the
    * same fp tree as the brute-force verifier, so an oracle mirrors the
    * whole operator including the pruning. */
  def semanticNearDups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      threshold: Double,
      broadcastThreshold: Int = BroadcastThreshold
  ): DataFrame = {
    // kmeansAssign keeps (id, vec, cell) map-side, so the norm is one more
    // map-side column — no re-join of the corpus on id (which would add a
    // full corpus exchange to the most expensive headline query).
    val v = kmeansAssign(corpus, idCol, vecCol, k, iters, broadcastThreshold)
      .withColumn("nrm", graft.functions.VectorFunctions.norm(col("vec")))
    v.alias("a")
      .join(v.alias("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cosine",
        when(col("a.nrm") === 0.0 || col("b.nrm") === 0.0, lit(0.0))
          .otherwise(graft.functions.VectorFunctions.dot(col("a.vec"), col("b.vec")) /
            (col("a.nrm") * col("b.nrm"))))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.cell").as("cell"), col("cosine"))
  }

  /** [[semanticNearDups]] with SemDeDup's k = ⌈√n⌉ sizing derived from the
    * SAME cached corpus the training then scans — the sizing count
    * materializes the cache the first k-means iteration needs anyway, so
    * the source is read once, not twice. */
  def semanticNearDupsAuto(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int,
      threshold: Double,
      broadcastThreshold: Int = BroadcastThreshold
  ): DataFrame = {
    val base = Parallelism.ensure(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))).cache()
    val k = math.ceil(math.sqrt(base.count().toDouble)).toInt
    semanticNearDups(base, "id", "vec", k, iters, threshold, broadcastThreshold)
  }

  /** Signed-random-projection bucket key per vector: `nPlanes` hyperplanes
    * with deterministic ±1 coefficients derived from (seed, plane, dim) via
    * md5 parity — reproducible across engines and runs without any RNG
    * state. Bucket = packed sign bits (long).
    *
    * The coefficient matrix depends only on (seed, plane, dim), so it is
    * computed ONCE driver-side (nPlanes·dim md5 calls total) and embedded
    * as literal arrays; the per-row work is then a pure multiply-add fold.
    * The previous in-plan formulation re-derived every coefficient with an
    * md5 per (row, plane, dim) — dim·nPlanes md5 calls per row. Values are
    * bit-identical: same md5 parity, same left-to-right fp fold order.
    * Vectors are assumed fixed-dimension (probed from the first row). */
  def lshBuckets(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int = 16,
      seed: Int = 42
  ): DataFrame = {
    val vec = col(vecCol)
    val head = corpus.select(size(vec).as("n")).head(1)
    val dim = if (head.isEmpty) 0 else head(0).getInt(0)
    val mdInst = java.security.MessageDigest.getInstance("MD5")
    // +1.0 when the first hex char of md5("seed:p:d") sits at an odd
    // (1-based) position in "0123456789abcdef", i.e. the high nibble of
    // byte 0 is even — exactly instr(hex)%2==1 of the portable SQL mirror.
    def coef(p: Int, d: Int): Double = {
      val dig = mdInst.digest(s"$seed:$p:$d".getBytes("UTF-8"))
      if (((dig(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
    }
    val planeBits: Seq[Column] = (0 until nPlanes).map { p =>
      val coefs = array((0 until dim).map(d => lit(coef(p, d))): _*)
      val proj = aggregate(
        zip_with(vec, coefs, (x, c) => x.cast("double") * c),
        lit(0.0),
        (acc, v) => acc + v)
      when(proj > 0, lit(1L)).otherwise(lit(0L))
    }
    val bucket = planeBits.foldLeft(lit(0L))((acc, b) => acc * 2 + b)
    Parallelism.ensure(corpus).select(
      col(idCol).as("id"),
      vec.as("vec"),
      bucket.as("bucket")
    )
  }
}

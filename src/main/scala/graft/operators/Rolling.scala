package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StructField, StructType}

import graft.api.TradingCols

/** Event-time rolling features over trailing time windows.
  *
  * Two implementations with identical semantics (bit-identical output,
  * pinned with doubleToLongBits in CoreOperatorsSpec):
  *
  *  - [[featuresDeclarative]]: RANGE frames on epoch-micros. Spark
  *    recomputes sliding frames per row (no retraction), so this is
  *    O(n·w) per partition — fine at bench scale, quadratic-ish for
  *    wide windows at 100 TB.
  *  - [[features]] (default for windows <= 1 day): a halo-chunked
  *    monotonic-deque scan. Rows are chunked by calendar day and the
  *    previous day's tail (within `window` of the boundary) is
  *    duplicated into each chunk as context, so every chunk computes
  *    independently — parallelism symbol × day with NO sequential
  *    cross-chunk pass, O(n) amortized per chunk (incremental sums,
  *    min/max via monotonic deques).
  *
  * Bit-exactness: the mean/vwap sums accumulate in exact integer
  * CENTS (prices are 2-decimal, so `round(price*100)` is an exact
  * Long and sums of cents·size are exact Longs), with one double
  * division per emitted row. Integer accumulation is order- and
  * algorithm-independent, so the incremental add/evict scan, the
  * RANGE-frame recompute, and the DuckDB oracle produce the SAME
  * IEEE double bit pattern — pinned with doubleToLongBits in
  * CoreOperatorsSpec (round 2 shipped float accumulate-subtract here
  * and drifted past the driver hash; this is the fix).
  */
object Rolling {

  /** Appends trailing-window features over the last `window`
    * (inclusive of the current tick):
    *  - rolling_vwap, rolling_mean_price, rolling_min/max, rolling_n
    *
    * Column contract: by default the output carries EVERY input
    * column, so the shuffle moves full rows — the right default for
    * the bench queries (they consume all columns), but real money on
    * a wide table at 100 TB. Pass `keep` to project the input to
    * `keep` ∪ the compute columns (symbol/ts/price/size) BEFORE the
    * shuffle; the projection reaches the parquet scan (pinned in
    * ExplainSpec), and the output then carries only those columns.
    */
  def features(
      df: DataFrame,
      window: String = "1 hour",
      c: TradingCols = TradingCols.default,
      keep: Seq[String] = Nil,
  ): DataFrame = {
    val base =
      if (keep.isEmpty) df
      else df.select((Seq(c.symbol, c.ts, c.price, c.size) ++ keep).distinct.map(col): _*)
    val m = windowMicros(window)
    if (m > 86400000000L) featuresDeclarative(base, window, c)
    else featuresScan(base, m, c)
  }

  /** RANGE-frame formulation (also the shape the DuckDB oracle uses). */
  def featuresDeclarative(
      df: DataFrame,
      window: String = "1 hour",
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val micros = windowMicros(window)
    val w = Window
      .partitionBy(col(c.symbol))
      .orderBy(unix_micros(col(c.ts)))
      .rangeBetween(-micros, 0)
    val cents = round(col(c.price) * lit(100)).cast(LongType)
    df.withColumn(
        "rolling_vwap",
        sum(cents * col(c.size)).over(w).cast(DoubleType)
          / sum(col(c.size)).over(w).cast(DoubleType) / lit(100.0),
      )
      .withColumn(
        "rolling_mean_price",
        sum(cents).over(w).cast(DoubleType)
          / count(lit(1)).over(w).cast(DoubleType) / lit(100.0),
      )
      .withColumn("rolling_min", min(col(c.price)).over(w))
      .withColumn("rolling_max", max(col(c.price)).over(w))
      .withColumn("rolling_n", count(lit(1)).over(w))
  }

  /** Halo-chunked deque scan; requires windowMicros <= 1 day so the
    * halo (context) rows of a chunk all come from the previous
    * calendar day's tail.
    */
  private def featuresScan(df: DataFrame, m: Long, c: TradingCols): DataFrame = {
    val day = 86400000000L
    val withUts = df
      .withColumn("__uts", unix_micros(col(c.ts)))
      .withColumn("__day", unix_micros(date_trunc("DAY", col(c.ts))))
    val base = withUts
      .withColumn("__chunk", col("__day"))
      .withColumn("__ctx", lit(false))
    // previous-day tail duplicated into the next chunk as context
    val halo = withUts
      .where(col("__day") + day - col("__uts") <= m)
      .withColumn("__chunk", col("__day") + day)
      .withColumn("__ctx", lit(true))
    val unioned = base.unionByName(halo).drop("__day")

    val sorted = unioned
      .repartition(col(c.symbol), col("__chunk"))
      .sortWithinPartitions(col(c.symbol), col("__chunk"), col("__uts"))

    val schema = sorted.schema
    val symIdx = schema.fieldIndex(c.symbol)
    val chunkIdx = schema.fieldIndex("__chunk")
    val utsIdx = schema.fieldIndex("__uts")
    val priceIdx = schema.fieldIndex(c.price)
    val sizeIdx = schema.fieldIndex(c.size)
    val ctxIdx = schema.fieldIndex("__ctx")
    val keepIdx = schema.fieldNames.zipWithIndex
      .collect { case (n, i) if n != "__uts" && n != "__chunk" && n != "__ctx" => i }
    val outSchema = StructType(
      keepIdx.map(schema.fields(_)).toSeq ++ Seq(
        StructField("rolling_vwap", DoubleType, nullable = true),
        StructField("rolling_mean_price", DoubleType, nullable = true),
        StructField("rolling_min", DoubleType, nullable = true),
        StructField("rolling_max", DoubleType, nullable = true),
        StructField("rolling_n", LongType, nullable = false),
      )
    )

    sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Row] {
        // per-(symbol, chunk) deque state
        var curSym: Any = null
        var curChunk: Long = Long.MinValue
        val q = new java.util.ArrayDeque[(Long, Double, Long)]() // (uts, price, size)
        val minQ = new java.util.ArrayDeque[(Long, Double)]()
        val maxQ = new java.util.ArrayDeque[(Long, Double)]()
        // exact integer accumulation: cents = round(price*100) is an
        // exact Long for 2-decimal prices, so add/evict cannot drift
        var sumPS, sumP = 0L
        var sumS, n = 0L
        // rows of one uts group awaiting emission (non-ctx only)
        var pendingOut: List[Row] = Nil

        private def resetChunk(): Unit = {
          q.clear(); minQ.clear(); maxQ.clear()
          sumPS = 0L; sumP = 0L; sumS = 0L; n = 0L
        }

        private def add(uts: Long, p: Double, s: Long): Unit = {
          q.addLast((uts, p, s))
          val cents = math.round(p * 100)
          sumPS += cents * s; sumP += cents; sumS += s; n += 1
          while (!minQ.isEmpty && minQ.peekLast()._2 > p) minQ.removeLast()
          minQ.addLast((uts, p))
          while (!maxQ.isEmpty && maxQ.peekLast()._2 < p) maxQ.removeLast()
          maxQ.addLast((uts, p))
        }

        private def evict(nowUts: Long): Unit = {
          while (!q.isEmpty && q.peekFirst()._1 < nowUts - m) {
            val (u, p, s) = q.removeFirst()
            val cents = math.round(p * 100)
            sumPS -= cents * s; sumP -= cents; sumS -= s; n -= 1
            if (!minQ.isEmpty && minQ.peekFirst()._1 == u && minQ.peekFirst()._2 == p) minQ.removeFirst()
            if (!maxQ.isEmpty && maxQ.peekFirst()._1 == u && maxQ.peekFirst()._2 == p) maxQ.removeFirst()
          }
        }

        override def hasNext: Boolean = {
          while (pendingOut.isEmpty && buf.hasNext) {
            val head = buf.head
            val sym = head.get(symIdx)
            val chunk = head.getLong(chunkIdx)
            if (sym != curSym || chunk != curChunk) {
              curSym = sym; curChunk = chunk; resetChunk()
            }
            // consume the whole equal-uts group first (RANGE-frame tie
            // semantics: ties see each other)
            val uts = head.getLong(utsIdx)
            var group: List[Row] = Nil
            while (
              buf.hasNext && buf.head.get(symIdx) == sym &&
              buf.head.getLong(chunkIdx) == chunk && buf.head.getLong(utsIdx) == uts
            ) {
              val r = buf.next()
              add(uts, r.getDouble(priceIdx), r.getLong(sizeIdx))
              if (!r.getBoolean(ctxIdx)) group = r :: group
            }
            evict(uts)
            pendingOut = group.reverse.map { r =>
              Row.fromSeq(
                // Seq[Any]: a bare Seq would widen the Long count to
                // Double and break the BIGINT field
                keepIdx.map(r.get).toSeq ++ Seq[Any](
                  sumPS.toDouble / sumS / 100.0,
                  sumP.toDouble / n / 100.0,
                  minQ.peekFirst()._2,
                  maxQ.peekFirst()._2,
                  n,
                )
              )
            }
          }
          pendingOut.nonEmpty
        }

        override def next(): Row = {
          val r = pendingOut.head; pendingOut = pendingOut.tail; r
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Multi-window features in ONE pass: every window's
    * vwap/mean/min/max/n columns (suffixed `_<name>`, where name is
    * the window spec with spaces stripped, e.g. `rolling_vwap_30minutes`)
    * computed from a single halo-chunk scan — one shuffle, one sort,
    * one pass over the ticks regardless of window count. The
    * per-window marginal cost is just its deque bookkeeping; Spark's
    * sliding RANGE frames would pay an O(n·w) recompute PER WINDOW
    * plus repeated window passes. The halo is sized by the LARGEST
    * window (all must be <= 1 day; otherwise compose
    * featuresDeclarative per long window).
    */
  def featuresMulti(
      df: DataFrame,
      windows: Seq[String],
      c: TradingCols = TradingCols.default,
      keep: Seq[String] = Nil,
  ): DataFrame = {
    require(windows.nonEmpty)
    val specs = windows.map(w => (w.trim.replaceAll("\\s+", ""), windowMicros(w)))
    require(specs.forall(_._2 <= 86400000000L), "all windows must be <= 1 day (halo bound)")
    val base =
      if (keep.isEmpty) df
      else df.select((Seq(c.symbol, c.ts, c.price, c.size) ++ keep).distinct.map(col): _*)
    featuresMultiScan(base, specs, c)
  }

  private def featuresMultiScan(
      df: DataFrame,
      specs: Seq[(String, Long)],
      c: TradingCols,
  ): DataFrame = {
    val day = 86400000000L
    val mMax = specs.map(_._2).max
    val withUts = df
      .withColumn("__uts", unix_micros(col(c.ts)))
      .withColumn("__day", unix_micros(date_trunc("DAY", col(c.ts))))
    val base = withUts
      .withColumn("__chunk", col("__day"))
      .withColumn("__ctx", lit(false))
    val halo = withUts
      .where(col("__day") + day - col("__uts") <= mMax)
      .withColumn("__chunk", col("__day") + day)
      .withColumn("__ctx", lit(true))
    val unioned = base.unionByName(halo).drop("__day")
    val sorted = unioned
      .repartition(col(c.symbol), col("__chunk"))
      .sortWithinPartitions(col(c.symbol), col("__chunk"), col("__uts"))

    val schema = sorted.schema
    val symIdx = schema.fieldIndex(c.symbol)
    val chunkIdx = schema.fieldIndex("__chunk")
    val utsIdx = schema.fieldIndex("__uts")
    val priceIdx = schema.fieldIndex(c.price)
    val sizeIdx = schema.fieldIndex(c.size)
    val ctxIdx = schema.fieldIndex("__ctx")
    val keepIdx = schema.fieldNames.zipWithIndex
      .collect { case (n, i) if n != "__uts" && n != "__chunk" && n != "__ctx" => i }
    val outSchema = StructType(
      keepIdx.map(schema.fields(_)).toSeq ++ specs.flatMap { case (nm, _) =>
        Seq(
          StructField(s"rolling_vwap_$nm", DoubleType, nullable = true),
          StructField(s"rolling_mean_price_$nm", DoubleType, nullable = true),
          StructField(s"rolling_min_$nm", DoubleType, nullable = true),
          StructField(s"rolling_max_$nm", DoubleType, nullable = true),
          StructField(s"rolling_n_$nm", LongType, nullable = false),
        )
      }
    )
    val ms = specs.map(_._2).toArray
    val nW = ms.length

    sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Row] {
        var curSym: Any = null
        var curChunk: Long = Long.MinValue
        val q = Array.fill(nW)(new java.util.ArrayDeque[(Long, Double, Long)]())
        val minQ = Array.fill(nW)(new java.util.ArrayDeque[(Long, Double)]())
        val maxQ = Array.fill(nW)(new java.util.ArrayDeque[(Long, Double)]())
        val sumPS = new Array[Long](nW)
        val sumP = new Array[Long](nW)
        val sumS = new Array[Long](nW)
        val nn = new Array[Long](nW)
        var pendingOut: List[Row] = Nil

        private def resetChunk(): Unit = {
          var k = 0
          while (k < nW) {
            q(k).clear(); minQ(k).clear(); maxQ(k).clear()
            sumPS(k) = 0L; sumP(k) = 0L; sumS(k) = 0L; nn(k) = 0L
            k += 1
          }
        }

        private def add(uts: Long, p: Double, s: Long): Unit = {
          val cents = math.round(p * 100)
          var k = 0
          while (k < nW) {
            q(k).addLast((uts, p, s))
            sumPS(k) += cents * s; sumP(k) += cents; sumS(k) += s; nn(k) += 1
            while (!minQ(k).isEmpty && minQ(k).peekLast()._2 > p) minQ(k).removeLast()
            minQ(k).addLast((uts, p))
            while (!maxQ(k).isEmpty && maxQ(k).peekLast()._2 < p) maxQ(k).removeLast()
            maxQ(k).addLast((uts, p))
            k += 1
          }
        }

        private def evict(nowUts: Long): Unit = {
          var k = 0
          while (k < nW) {
            while (!q(k).isEmpty && q(k).peekFirst()._1 < nowUts - ms(k)) {
              val (u, p, s) = q(k).removeFirst()
              val cents = math.round(p * 100)
              sumPS(k) -= cents * s; sumP(k) -= cents; sumS(k) -= s; nn(k) -= 1
              if (!minQ(k).isEmpty && minQ(k).peekFirst()._1 == u && minQ(k).peekFirst()._2 == p)
                minQ(k).removeFirst()
              if (!maxQ(k).isEmpty && maxQ(k).peekFirst()._1 == u && maxQ(k).peekFirst()._2 == p)
                maxQ(k).removeFirst()
            }
            k += 1
          }
        }

        override def hasNext: Boolean = {
          while (pendingOut.isEmpty && buf.hasNext) {
            val head = buf.head
            val sym = head.get(symIdx)
            val chunk = head.getLong(chunkIdx)
            if (sym != curSym || chunk != curChunk) {
              curSym = sym; curChunk = chunk; resetChunk()
            }
            val uts = head.getLong(utsIdx)
            var group: List[Row] = Nil
            while (
              buf.hasNext && buf.head.get(symIdx) == sym &&
              buf.head.getLong(chunkIdx) == chunk && buf.head.getLong(utsIdx) == uts
            ) {
              val r = buf.next()
              add(uts, r.getDouble(priceIdx), r.getLong(sizeIdx))
              if (!r.getBoolean(ctxIdx)) group = r :: group
            }
            evict(uts)
            pendingOut = group.reverse.map { r =>
              val feats = (0 until nW).flatMap { k =>
                Seq[Any](
                  sumPS(k).toDouble / sumS(k) / 100.0,
                  sumP(k).toDouble / nn(k) / 100.0,
                  minQ(k).peekFirst()._2,
                  maxQ(k).peekFirst()._2,
                  nn(k),
                )
              }
              Row.fromSeq(keepIdx.map(r.get).toSeq ++ feats)
            }
          }
          pendingOut.nonEmpty
        }

        override def next(): Row = {
          val r = pendingOut.head; pendingOut = pendingOut.tail; r
        }
      }
    }(Encoders.row(outSchema))
  }

  private[graft] def windowMicros(window: String): Long = {
    val parts = window.trim.split("\\s+")
    require(parts.length == 2, s"window must be '<n> <unit>', got $window")
    val n = parts(0).toLong
    val perUnit = parts(1).toLowerCase match {
      case u if u.startsWith("second") => 1000000L
      case u if u.startsWith("minute") => 60000000L
      case u if u.startsWith("hour")   => 3600000000L
      case u if u.startsWith("day")    => 86400000000L
      case u => throw new IllegalArgumentException(s"unsupported unit $u")
    }
    n * perUnit
  }
}

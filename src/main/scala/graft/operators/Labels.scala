package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.TradingCols
import graft.functions.Ewm

/** Financial ML labels (AFML-style), re-expressed as Spark plans.
  *
  * Covers the reference's labels module:
  *  - fixed_time_return[,_classification]
  *    (/root/reference/polars_trading/labels/labels.py:70,30)
  *  - daily_vol (dynamic_labels.py:14)
  *  - get_vertical_barrier_by_timedelta (dynamic_labels.py:89)
  *  - triple-barrier labeling (dynamic_labels.py:173 — left
  *    unfinished in the reference; completed here per AFML pg.45 and
  *    the reference's own pandas oracle _testing/labels.py:27).
  */
object Labels {

  /** Division with null (not ANSI abort / inf) on a zero denominator.
    * Degenerate-price policy: the canonical trades view already drops
    * zero-price ticks, but the operators must not abort a 100 TB job
    * if one slips through — a return against a zero price is undefined
    * and propagates as null, same as an incomplete forward window.
    */
  private[graft] def safeDiv(num: Column, den: Column): Column =
    num / nullif(den, lit(0))

  /** Single-frame parity (reference labels take `symbol: IntoExpr |
    * None`, labels.py:35): a frame without the symbol column is one
    * instrument — run under a constant key, drop it on the way out.
    */
  private def singleFrame(df: DataFrame, c: TradingCols)(f: DataFrame => DataFrame): DataFrame =
    if (df.columns.contains(c.symbol)) f(df)
    else f(df.withColumn(c.symbol, lit("__single"))).drop(c.symbol)

  /** Time ordering with the tradeId tiebreak when present (synthetic
    * single-column frames may carry only ts+price).
    */
  private def timeOrd(df: DataFrame, c: TradingCols): Seq[Column] =
    if (df.columns.contains(c.tradeId)) Seq(col(c.ts), col(c.tradeId)) else Seq(col(c.ts))

  /** Forward return: price[t+offset+window] / price[t+offset] - 1
    * per symbol in time order (labels.py:96).
    */
  def fixedTimeReturn(
      df: DataFrame,
      window: Int,
      offset: Int = 1,
      c: TradingCols = TradingCols.default,
      outCol: String = "fwd_return",
  ): DataFrame = singleFrame(df, c) { d =>
    val w = Window.partitionBy(col(c.symbol)).orderBy(timeOrd(d, c): _*)
    d.withColumn(
      outCol,
      safeDiv(lead(col(c.price), offset + window).over(w), lead(col(c.price), offset).over(w)) - 1,
    )
  }

  /** Classify values by sign or by ±threshold into {-1, 0, 1}
    * (labels.py:15 `_classify_by_threshold`). Null-safe: null values
    * (incomplete forward windows) stay null.
    */
  def classifyByThreshold(values: Column, threshold: Option[Column]): Column =
    (threshold match {
      case None => signum(values)
      case Some(t) =>
        when(values > abs(t), 1)
          .when(values < -abs(t), -1)
          .when(values.between(-abs(t), abs(t)), 0)
          .otherwise(lit(null))
    }).cast("int")

  /** fixed_time_return + threshold classification (labels.py:30). */
  def fixedTimeReturnClassification(
      df: DataFrame,
      window: Int,
      threshold: Option[Column] = None,
      offset: Int = 1,
      c: TradingCols = TradingCols.default,
      outCol: String = "label",
  ): DataFrame = {
    val withRet = fixedTimeReturn(df, window, offset, c, "__ret")
    withRet
      .withColumn(outCol, classifyByThreshold(col("__ret"), threshold))
      .drop("__ret")
  }

  /** 24h-lookback returns (the inner step of daily_vol,
    * dynamic_labels.py:49-61): for each tick, the as-of price at
    * ts - lookback, and the simple return against it.
    * Output: symbol, ts, price, lookback_price, return24h (null when
    * no tick precedes the lookback point).
    */
  def returns24h(
      df: DataFrame,
      lookback: String = "24 hours",
      c: TradingCols = TradingCols.default,
  ): DataFrame = singleFrame(df, c) { df =>
    val left = df.select(
      col(c.symbol),
      col(c.ts),
      col(c.price),
      (col(c.ts) - expr(s"INTERVAL $lookback")).as("__lookback"),
    )
    val right = df.select(
      col(c.symbol),
      col(c.ts).as("__rts"),
      col(c.price).as("lookback_price"),
    )
    AsofJoin
      .asof(left, right, leftOn = "__lookback", rightOn = "__rts", by = Seq(c.symbol))
      .withColumn("return24h", safeDiv(col(c.price), col("lookback_price")) - 1)
      .drop("__lookback")
  }

  /** Daily volatility (dynamic_labels.py:14): EWM std (span) of the
    * 24h-lookback returns, per symbol.
    * Output: symbol, ts, daily_return_volatility (one row per tick).
    */
  def dailyVol(
      df: DataFrame,
      span: Int = 100,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    // single-security parity (reference dynamic_labels.py:45): a frame
    // without the symbol column is treated as one instrument
    val hasSymbol = df.columns.contains(c.symbol)
    val withSym = if (hasSymbol) df else df.withColumn(c.symbol, lit("__single"))
    // Path gate: the monolithic scan is one exchange + one sorted pass
    // with per-SYMBOL parallelism — optimal until a single symbol's
    // history outgrows one core. Past the byte gate, switch to the
    // (symbol, day)-chunked fused scan, which trades two extra
    // metadata folds for a symbol x day parallelism axis.
    //
    // Reproducibility note (r12 advice): the auto gate reads plan-stats
    // leaf sizeInBytes, which tracks FILE bytes — the same logical
    // dataset can cross the boundary under a different parquet
    // compression, and the two paths differ by ~1e-15 relative (the
    // chunk folds use pow(decay, n) carries). Pipelines that need a
    // bit-reproducible path choice should pin it explicitly with
    // spark.graft.dailyVolPath=flat|chunked; the oracle sweep SFs all
    // sit far below the default 8 GiB gate (flat path).
    val pathConf = df.sparkSession.conf
      .getOption("spark.graft.dailyVolPath")
      .getOrElse("auto")
    val useFlat = pathConf match {
      case "flat" => true
      case "chunked" => false
      case "auto" =>
        val leafBytes = withSym.queryExecution.optimizedPlan
          .collectLeaves()
          .map(_.stats.sizeInBytes)
          .sum
        // 8 GiB default (r13): the flat path's real limit is
        // PER-SYMBOL density (one core consumes a symbol's stream at
        // ~1-2M ticks/s), which total bytes only proxy. The sf100
        // probe measured the old 1 GiB gate flipping too early: at
        // 100M ticks / 50 symbols (1.8 GB) flat ran 98 s vs
        // chunked 215 s — 2.2x the wrong way. A table past 8 GiB on
        // a 2k-symbol universe still flips long before any single
        // symbol saturates a core; genuinely skewed universes should
        // pin spark.graft.dailyVolPath=chunked explicitly.
        val gate = df.sparkSession.conf
          .getOption("spark.graft.dailyVolChunkBytes")
          .map(BigInt(_))
          .getOrElse(BigInt(8L << 30))
        leafBytes <= gate
      case other =>
        throw new IllegalArgumentException(
          s"spark.graft.dailyVolPath must be auto|flat|chunked, got '$other'")
    }
    val vol =
      if (useFlat) dailyVolScan(withSym, span, c)
      else dailyVolFused(withSym, span, c)
    if (hasSymbol) vol else vol.drop(c.symbol)
  }

  /** Monolithic fused daily-vol: one hash exchange on symbol, one
    * in-partition sort, one streaming pass that resolves the 24h
    * as-of lookback from a trailing ring buffer (the last 24h of
    * ticks per symbol) and folds the return straight into the EWM std
    * recurrence — no joins, no barriers, no second pass. Per-row
    * arithmetic is identical to returns24h + Ewm.stdOverKey: the
    * lookback row is the last tick with rts <= ts-24h (inclusive,
    * insertion-order ties), x = price/lookback - 1 via the same IEEE
    * ops, and the recurrence is the same multiply-add sequence.
    *
    * Parallelism is per symbol, so a symbol whose full history
    * exceeds one core's throughput bounds the wall time — dailyVol
    * gates this path by input size and falls over to the
    * (symbol, day)-chunked [[dailyVolFused]] beyond it.
    */
  private def dailyVolScan(df: DataFrame, span: Int, c: TradingCols): DataFrame = {
    require(span >= 1, "span must be >= 1")
    val alpha = 2.0 / (span + 1.0)
    val decay = 1.0 - alpha
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

    val pruned = df.select(col(c.symbol), col(c.ts), col(c.price))
    // price as the equal-ts tiebreak (nulls first) — the SAME total
    // order the fused path's sort and lastByOrd carry use, so the
    // closing tick at a tied timestamp is identical across the flat
    // scan, the fused halo, and the fused >=2-day carry (r12 advice).
    // Rows with equal (ts, price) are interchangeable for both the
    // lookback and the EWM fold, so this order is value-deterministic.
    val sorted = pruned
      .repartition(col(c.symbol))
      .sortWithinPartitions(col(c.symbol), col(c.ts), col(c.price))
    val symIdx = sorted.schema.fieldIndex(c.symbol)
    val tsIdx = sorted.schema.fieldIndex(c.ts)
    val pxIdx = sorted.schema.fieldIndex(c.price)
    val outSchema = StructType(
      Seq(
        sorted.schema(c.symbol),
        sorted.schema(c.ts),
        StructField("daily_return_volatility", DoubleType, nullable = true),
      )
    )
    val dayMicros = 24L * 3600L * 1000000L
    sorted.mapPartitions { it =>
      var curSym: Any = null
      // trailing 24h of (ts micros, price-or-null); head is the
      // current as-of candidate once its successor passes the target
      var ring = new java.util.ArrayDeque[(Long, Any)]()
      var sumW, sumWX, sumWX2, sumW2 = 0.0
      it.map { row =>
        val sym = row.get(symIdx)
        if (sym != curSym) {
          curSym = sym
          ring = new java.util.ArrayDeque[(Long, Any)]()
          sumW = 0.0; sumWX = 0.0; sumWX2 = 0.0; sumW2 = 0.0
        }
        // getAs keeps this agnostic to TIMESTAMP vs TIMESTAMP_NTZ
        // external classes; micros compare exactly either way
        val ts = row.get(tsIdx) match {
          case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
          case t: java.time.LocalDateTime =>
            t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
          case t: Long => t
        }
        val target = ts - dayMicros
        while (ring.size > 1 && { val i = ring.iterator; i.next(); i.next()._1 <= target })
          ring.pollFirst()
        val lb: Any =
          if (!ring.isEmpty && ring.peekFirst()._1 <= target) ring.peekFirst()._2 else null
        val px: Any = if (row.isNullAt(pxIdx)) null else row.getDouble(pxIdx)
        ring.addLast((ts, px))
        sumW *= decay; sumWX *= decay; sumWX2 *= decay; sumW2 *= decay * decay
        val out: Any =
          if (px == null || lb == null || lb.asInstanceOf[Double] == 0.0) null
          else {
            val x = px.asInstanceOf[Double] / lb.asInstanceOf[Double] - 1
            sumW += 1.0; sumWX += x; sumWX2 += x * x; sumW2 += 1.0
            val mean = sumWX / sumW
            val varBiased = math.max(sumWX2 / sumW - mean * mean, 0.0)
            val denom = sumW * sumW - sumW2
            if (denom <= 0.0) 0.0
            else math.sqrt(varBiased * sumW * sumW / denom)
          }
        Row(row.get(symIdx), row.get(tsIdx), out)
      }
    }(Encoders.row(outSchema))
  }

  /** Fused daily-vol scan: the 24h as-of lookback and the EWM std
    * recurrence in ONE (symbol, day)-chunked segmented scan, instead
    * of a symbol-keyed as-of shuffle (5-way parallel on a 5-symbol
    * feed) followed by the 3-pass chunked EWM.
    *
    * The lookback is exactly a one-day halo: for a tick at ts in day
    * d, the as-of target ts-24h is served by day d-1's ticks (shipped
    * into chunk d as halo rows with sort position ts+24h — the
    * backward-inclusive predicate rts <= ts-24h is exactly
    * rts+24h <= ts, integer-microsecond exact) plus the last price of
    * days <= d-2 (a per-chunk carry folded from one metadata row per
    * (symbol, day)). The EWM carry chain is the same summaries->fold->
    * reseed composition as Ewm.stdOverKeyChunked, so per-row results
    * are bit-identical to the unfused pipeline: same x values (same
    * lookback row, same division), same chunk boundaries (UTC epoch
    * day of ts), same seeded sequential recurrence.
    *
    * At 100 TB the shape is unchanged from the unfused plan — chunk
    * parallelism symbol x day, carries are metadata-sized — but two
    * full-data exchanges replace three plus the as-of window
    * (refbench 1M/5-symbol: 2.1 s -> see SURVEY §6i round-12 row).
    */
  private def dailyVolFused(df: DataFrame, span: Int, c: TradingCols): DataFrame = {
    require(span >= 1, "span must be >= 1")
    val alpha = 2.0 / (span + 1.0)
    val decay = 1.0 - alpha
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

    val base0 = df
      .select(col(c.symbol), col(c.ts), col(c.price))
      .withColumn("__chunk", unix_date(to_date(col(c.ts))))
    // a small input arrives in one or two scan partitions, which would
    // single-thread the map side of both passes' exchanges; a 100 TB
    // scan is already wide and must NOT pay an extra full shuffle
    val para = df.sparkSession.sparkContext.defaultParallelism
    val base =
      if (base0.rdd.getNumPartitions < para) base0.repartition(para) else base0
    val ckpt = graft.sources.Checkpoint.tableGated(base, "daily-vol")

    // own rows sort at their own ts; halo rows (yesterday's ticks) at
    // ts+24h, tag 0 < 1 so an exact-24h match is inclusive (backward).
    // One explode, NOT a union: Catalyst pushes a repartition below a
    // union per branch, and UnionExec concatenates the branches'
    // partition LISTS — each (symbol, day) group would appear once per
    // branch and the chunk scans would see it as two disjoint runs.
    val rows = ckpt
      .select(
        col(c.symbol),
        explode(
          array(
            struct(
              col("__chunk"),
              col(c.ts).as("__adj"),
              lit(1).as("__tag"),
              col(c.price).as("__px"),
            ),
            struct(
              (col("__chunk") + 1).as("__chunk"),
              (col(c.ts) + expr("INTERVAL 24 hours")).as("__adj"),
              lit(0).as("__tag"),
              col(c.price).as("__px"),
            ),
          )
        ).as("__r"),
      )
      .select(col(c.symbol), col("__r.__chunk"), col("__r.__adj"), col("__r.__tag"), col("__r.__px"))

    // one metadata row per (symbol, day): the day's closing price.
    // ord2 = coalesce(price, -inf) keeps null-price rows IN the
    // ordering (OrderedHead ignores null-ord rows) exactly where the
    // nulls-first ascending sorts of the halo/flat paths place them,
    // so all three closing-tick resolutions agree at equal-ts ties
    // (r12 advice: one tiebreak everywhere).
    val lastPx = ckpt
      .groupBy(col(c.symbol), col("__chunk"))
      .agg(
        graft.functions.OrderedAgg
          .lastByOrd(
            col(c.price),
            col(c.ts),
            coalesce(col(c.price), lit(Double.NegativeInfinity)),
          )
          .as("__px"))

    // price carry: for chunk d, the last price over days <= d-2 (day
    // d-1 arrives as halo rows; gap days fall through to the carry)
    val lpSorted = lastPx
      .repartition(col(c.symbol))
      .sortWithinPartitions(col(c.symbol), col("__chunk"))
    val pcSchema = StructType(
      Seq(
        lpSorted.schema(c.symbol),
        lpSorted.schema("__chunk"),
        StructField("__lb0", DoubleType, nullable = true),
      )
    )
    val symIdx = lpSorted.schema.fieldIndex(c.symbol)
    val chIdx = lpSorted.schema.fieldIndex("__chunk")
    val pxIdx = lpSorted.schema.fieldIndex("__px")
    val priceCarry = lpSorted
      .mapPartitions { it =>
        var curSym: Any = null
        val pending = scala.collection.mutable.Queue.empty[(Int, Any)]
        var usable: Any = null
        it.map { r =>
          val sym = r.get(symIdx)
          if (sym != curSym) { curSym = sym; pending.clear(); usable = null }
          val d = r.getInt(chIdx)
          while (pending.nonEmpty && pending.head._1 <= d - 2) usable = pending.dequeue()._2
          val out = Row(r.get(symIdx), d, usable)
          pending.enqueue((d, r.get(pxIdx)))
          out
        }
      }(Encoders.row(pcSchema))
      // carries are metadata-sized (one row per symbol-day); the
      // barrier stops m1/m2 from re-deriving the lastPx aggregation
      .localCheckpoint()
    // broadcast gate: one row per (symbol, day) — e.g. 10k symbols x
    // 25y ~ 90M rows would NOT broadcast; SMJ is the fallback there
    val bcastCarries = priceCarry.count() <= 2000000L
    def bc(carry: DataFrame): DataFrame = if (bcastCarries) broadcast(carry) else carry

    // pass 1: per-chunk local EWM end states, lookback resolved from
    // the halo merge (zero-seeded, same recurrence as Ewm pass 1)
    def merged(extra: DataFrame): DataFrame = rows
      .join(bc(extra), Seq(c.symbol, "__chunk"), "left")
      .repartition(col(c.symbol), col("__chunk"))
      // __px last: equal-(adj, tag) ties resolve by price (nulls
      // first), matching the flat scan's (ts, price) sort
      .sortWithinPartitions(
        col(c.symbol), col("__chunk"), col("__adj"), col("__tag"), col("__px"))

    val m1 = merged(priceCarry)
    val m1Key = Seq(c.symbol, "__chunk").map(m1.schema.fieldIndex)
    val m1Tag = m1.schema.fieldIndex("__tag")
    val m1Px = m1.schema.fieldIndex("__px")
    val m1Lb = m1.schema.fieldIndex("__lb0")
    val sumSchema = StructType(
      Seq(
        m1.schema(c.symbol),
        m1.schema("__chunk"),
        StructField("__n", LongType, nullable = false),
        StructField("__eW", DoubleType, nullable = false),
        StructField("__eWX", DoubleType, nullable = false),
        StructField("__eWX2", DoubleType, nullable = false),
        StructField("__eW2", DoubleType, nullable = false),
      )
    )
    val summaries = m1.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var curKey: Seq[Any] = null
      var lastLb: Any = null
      var n = 0L
      var sumW, sumWX, sumWX2, sumW2 = 0.0
      def flush(): Unit =
        if (curKey != null) out += Row.fromSeq(curKey ++ Seq[Any](n, sumW, sumWX, sumWX2, sumW2))
      it.foreach { row =>
        val key = m1Key.map(row.get)
        if (key != curKey) {
          flush()
          curKey = key
          lastLb = if (row.isNullAt(m1Lb)) null else row.getDouble(m1Lb)
          n = 0L; sumW = 0.0; sumWX = 0.0; sumWX2 = 0.0; sumW2 = 0.0
        }
        if (row.getInt(m1Tag) == 0) {
          lastLb = if (row.isNullAt(m1Px)) null else row.getDouble(m1Px)
        } else {
          n += 1
          sumW *= decay; sumWX *= decay; sumWX2 *= decay; sumW2 *= decay * decay
          if (!row.isNullAt(m1Px) && lastLb != null && lastLb.asInstanceOf[Double] != 0.0) {
            val x = row.getDouble(m1Px) / lastLb.asInstanceOf[Double] - 1
            sumW += 1.0; sumWX += x; sumWX2 += x * x; sumW2 += 1.0
          }
        }
      }
      flush()
      out.iterator
    }(Encoders.row(sumSchema))

    // pass 2: fold the per-chunk summaries into carry-in states (one
    // metadata row per chunk; identical composition to Ewm pass 2)
    val sSorted = summaries
      .repartition(col(c.symbol))
      .sortWithinPartitions(col(c.symbol), col("__chunk"))
    val carrySchema = StructType(
      Seq(
        m1.schema(c.symbol),
        m1.schema("__chunk"),
        StructField("__cW", DoubleType, nullable = false),
        StructField("__cWX", DoubleType, nullable = false),
        StructField("__cWX2", DoubleType, nullable = false),
        StructField("__cW2", DoubleType, nullable = false),
      )
    )
    val ewmCarry = sSorted
      .mapPartitions { it =>
        var curSym: Any = null
        var cW, cWX, cWX2, cW2 = 0.0
        it.map { s =>
          val sym = s.get(0)
          if (sym != curSym) {
            curSym = sym; cW = 0.0; cWX = 0.0; cWX2 = 0.0; cW2 = 0.0
          }
          val carry = Row(s.get(0), s.get(1), cW, cWX, cWX2, cW2)
          val n = s.getLong(2)
          val dn = math.pow(decay, n.toDouble)
          val dn2 = math.pow(decay * decay, n.toDouble)
          cW = cW * dn + s.getDouble(3)
          cWX = cWX * dn + s.getDouble(4)
          cWX2 = cWX2 * dn + s.getDouble(5)
          cW2 = cW2 * dn2 + s.getDouble(6)
          carry
        }
      }(Encoders.row(carrySchema))
      // barrier: pass 1 runs exactly once; m2's plan joins a
      // materialized metadata table instead of replaying the scan
      .localCheckpoint()

    // pass 3: rescan each chunk seeded with its carries, emit own rows
    val m2 = merged(priceCarry.join(ewmCarry, Seq(c.symbol, "__chunk"), "left"))
    val m2Key = Seq(c.symbol, "__chunk").map(m2.schema.fieldIndex)
    val m2Tag = m2.schema.fieldIndex("__tag")
    val m2Px = m2.schema.fieldIndex("__px")
    val m2Lb = m2.schema.fieldIndex("__lb0")
    val m2Adj = m2.schema.fieldIndex("__adj")
    val m2Sym = m2.schema.fieldIndex(c.symbol)
    val cIdx = Seq("__cW", "__cWX", "__cWX2", "__cW2").map(m2.schema.fieldIndex)
    val outSchema = StructType(
      Seq(
        m2.schema(c.symbol),
        StructField(c.ts, m2.schema("__adj").dataType, nullable = true),
        StructField("daily_return_volatility", DoubleType, nullable = true),
      )
    )
    m2.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var lastLb: Any = null
      var sumW, sumWX, sumWX2, sumW2 = 0.0
      it.flatMap { row =>
        val key = m2Key.map(row.get)
        if (key != curKey) {
          curKey = key
          lastLb = if (row.isNullAt(m2Lb)) null else row.getDouble(m2Lb)
          sumW = if (row.isNullAt(cIdx(0))) 0.0 else row.getDouble(cIdx(0))
          sumWX = if (row.isNullAt(cIdx(1))) 0.0 else row.getDouble(cIdx(1))
          sumWX2 = if (row.isNullAt(cIdx(2))) 0.0 else row.getDouble(cIdx(2))
          sumW2 = if (row.isNullAt(cIdx(3))) 0.0 else row.getDouble(cIdx(3))
        }
        if (row.getInt(m2Tag) == 0) {
          lastLb = if (row.isNullAt(m2Px)) null else row.getDouble(m2Px)
          None
        } else {
          sumW *= decay; sumWX *= decay; sumWX2 *= decay; sumW2 *= decay * decay
          val out: Any =
            if (row.isNullAt(m2Px) || lastLb == null || lastLb.asInstanceOf[Double] == 0.0) null
            else {
              val x = row.getDouble(m2Px) / lastLb.asInstanceOf[Double] - 1
              sumW += 1.0; sumWX += x; sumWX2 += x * x; sumW2 += 1.0
              val mean = sumWX / sumW
              val varBiased = math.max(sumWX2 / sumW - mean * mean, 0.0)
              val denom = sumW * sumW - sumW2
              if (denom <= 0.0) 0.0
              else math.sqrt(varBiased * sumW * sumW / denom)
            }
          Some(Row(row.get(m2Sym), row.get(m2Adj), out))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Vertical barrier (dynamic_labels.py:89): first observed
    * timestamp >= ts + offset, per symbol (inclusive forward as-of).
    * Output: symbol, ts, vertical_barrier (null when none follows).
    */
  def verticalBarrier(
      df: DataFrame,
      offset: String = "24 hours",
      c: TradingCols = TradingCols.default,
  ): DataFrame = singleFrame(df, c) { df =>
    val left = df.select(
      col(c.symbol),
      col(c.ts),
      (col(c.ts) + expr(s"INTERVAL $offset")).as("__off"),
    )
    val right = df.select(col(c.symbol), col(c.ts).as("__rts"), col(c.ts).as("vertical_barrier"))
    AsofJoin
      .asof(
        left,
        right,
        leftOn = "__off",
        rightOn = "__rts",
        by = Seq(c.symbol),
        direction = AsofJoin.Forward,
      )
      .select(col(c.symbol), col(c.ts), col("vertical_barrier"))
  }

  /** Barrier touch timestamps per event (the reference's intended
    * `apply_profit_taking_stop_loss` / AFML `apply_pt_sl_on_t1`,
    * _testing/labels.py:27): for each tick, the earliest path tick
    * whose return crosses +pt / -sl within the horizon, plus the
    * capped vertical barrier. tripleBarrier derives its label from
    * exactly these.
    */
  def barrierTouches(
      df: DataFrame,
      horizon: String = "24 hours",
      ptMult: Double = 1.0,
      slMult: Double = 1.0,
      constTarget: Option[Double] = None,
      volSpan: Int = 100,
      c: TradingCols = TradingCols.default,
  ): DataFrame = singleFrame(df, c) { df =>
    tripleBarrierCoreScan(df, horizon, ptMult, slMult, volSpan, constTarget, c)
      .select(col(c.symbol), col(c.ts), col("trgt"), col("t1"), col("pt_ts"), col("sl_ts"))
  }

  /** Triple-barrier label (AFML pg.45; completes the reference's
    * stub). For each event (tick) with volatility target `trgt`:
    *  - upper barrier: +ptMult * trgt, lower: -slMult * trgt on the
    *    path return price_u/price_t - 1 for t < u <= t1,
    *  - vertical barrier t1 = ts + horizon (capped at the symbol's
    *    last tick).
    * Emits the first barrier touched, its timestamp, the realized
    * return at the touch, and the label (1 profit-take, -1 stop-loss,
    * 0/sign vertical).
    *
    * Scale: the event×path join is bucketed by horizon-sized time
    * buckets — each event joins only its own and the next bucket, so
    * fan-out is bounded by path length, never n² per symbol.
    */
  def tripleBarrier(
      df: DataFrame,
      horizon: String = "24 hours",
      ptMult: Double = 1.0,
      slMult: Double = 1.0,
      volSpan: Int = 100,
      /** Some(x): constant volatility target x (SQL-oracle-able);
        * None: EWM daily_vol target (reference behavior). */
      constTarget: Option[Double] = None,
      signOnVertical: Boolean = false,
      c: TradingCols = TradingCols.default,
  ): DataFrame = singleFrame(df, c) { df =>
    val agg =
      if (sys.env.contains("GRAFT_TB_JOINCORE"))
        tripleBarrierCore(df, horizon, ptMult, slMult, volSpan, constTarget, c)
      else tripleBarrierCoreScan(df, horizon, ptMult, slMult, volSpan, constTarget, c)
    val ptFirst = col("pt_ts").isNotNull && (col("sl_ts").isNull || col("pt_ts") <= col("sl_ts"))
    val slFirst = col("sl_ts").isNotNull && !ptFirst
    val verticalLabel =
      if (signOnVertical) signum(col("__v_ret")).cast("int") else lit(0)
    agg
      .withColumn("touch_ts", when(ptFirst, col("pt_ts")).when(slFirst, col("sl_ts")).otherwise(col("t1")))
      .withColumn(
        "touch_return",
        when(ptFirst, col("__pt_ret")).when(slFirst, col("__sl_ret")).otherwise(col("__v_ret")),
      )
      .withColumn("label", when(ptFirst, 1).when(slFirst, -1).otherwise(verticalLabel).cast("int"))
      .select(
        col(c.symbol), col(c.ts), col("trgt"), col("t1"),
        col("touch_ts"), col("touch_return"), col("label"),
      )
  }

  /** Shared event×path crossing aggregation behind barrierTouches and
    * tripleBarrier: per event, the earliest pt/sl crossing ticks and
    * realized returns plus the vertical-barrier return.
    */
  private[graft] def parseHorizonMicros(horizon: String): Long = {
    val parts = horizon.split("\\s+")
    val n = parts(0).toLong
    val unit = parts(1).toLowerCase
    val perUnit = unit match {
      case u if u.startsWith("hour")   => 3600000000L
      case u if u.startsWith("minute") => 60000000L
      case u if u.startsWith("day")    => 86400000000L
      case u if u.startsWith("second") => 1000000L
      case _ => throw new IllegalArgumentException(s"unsupported horizon unit: $unit")
    }
    n * perUnit
  }

  private[graft] def tripleBarrierCore(
      df: DataFrame,
      horizon: String,
      ptMult: Double,
      slMult: Double,
      volSpan: Int,
      constTarget: Option[Double],
      c: TradingCols,
  ): DataFrame = {
    val horizonMicros = parseHorizonMicros(horizon)

    val lastTs = df
      .groupBy(col(c.symbol))
      .agg(max(col(c.ts)).as("__last_ts"))

    val withTarget = constTarget match {
      case Some(x) =>
        df.select(col(c.symbol), col(c.ts), col(c.price)).withColumn("trgt", lit(x))
      case None =>
        val vol = dailyVol(df, volSpan, c)
          .withColumnRenamed("daily_return_volatility", "trgt")
        df.select(col(c.symbol), col(c.ts), col(c.price)).join(vol, Seq(c.symbol, c.ts))
    }
    val events = withTarget
      .join(broadcast(lastTs), Seq(c.symbol))
      .where(col("trgt").isNotNull && col("trgt") > 0)
      .withColumn(
        "t1",
        least(col(c.ts) + expr(s"INTERVAL $horizon"), col("__last_ts")),
      )
      .drop("__last_ts")

    // bucketed range join: event intervals [ts..t1] x path ticks
    val path = df.select(col(c.symbol), col(c.ts).as("__u"), col(c.price).as("__pu"))
    val touches = RangeJoin
      .intervalJoin(
        events,
        path,
        by = Seq(c.symbol),
        startCol = c.ts,
        endCol = "t1",
        pointCol = "__u",
        bucketMicros = horizonMicros,
      )
      .withColumn("__ret", safeDiv(col("__pu"), col(c.price)) - 1)
      .withColumn("__pt_u", when(col("__ret") >= col("trgt") * ptMult, col("__u")))
      .withColumn("__sl_u", when(col("__ret") <= -col("trgt") * slMult, col("__u")))
    // min_by / arg_min skip rows with null ordering in both Spark and
    // DuckDB, so the CASE-guarded orderings select the earliest
    // crossing tick (and its realized return) directly.
    touches
      .groupBy(col(c.symbol), col(c.ts), col(c.price), col("trgt"), col("t1"))
      .agg(
        min(col("__pt_u")).as("pt_ts"),
        min(col("__sl_u")).as("sl_ts"),
        min_by(col("__ret"), col("__pt_u")).as("__pt_ret"),
        min_by(col("__ret"), col("__sl_u")).as("__sl_ret"),
        max_by(col("__ret"), col("__u")).as("__v_ret"),
      )
  }

  /** One event's first-crossing result from the scan core (field
    * order mirrors the join core's groupBy output).
    */
  private[graft] final case class TbScanRow(
      symbol: String,
      ts_us: Long,
      price: Double,
      trgt: Double,
      t1_us: Long,
      pt_us: Option[Long],
      sl_us: Option[Long],
      pt_ret: Option[Double],
      sl_ret: Option[Double],
      v_ret: Option[Double],
  )

  /** Production path for the event×path crossing aggregation: a
    * day-chunked halo scan with per-chunk SEGMENT-TREE crossing
    * search, O((n + q)·log n) per chunk instead of the interval
    * join's O(n × ticks-per-horizon) pair materialization — the pair
    * count grows with tick DENSITY (at 100 TB a liquid symbol has
    * 10^5+ ticks per horizon window, a 10^5× row blow-up the join
    * form shuffles and hash-aggregates; the scan shuffles each tick
    * ~twice: once to its own day chunk, once as the previous day's
    * halo).
    *
    * Per chunk: ticks sorted by (ts, trade_id); max/min segment trees
    * over price; each event binary-searches its (ts, t1] range and
    * descends leftmost-true for the first pt/sl crossing. Valid
    * because return = p/p0 − 1 is monotone in p under IEEE rounding
    * (p0 > 0), so "subtree max crosses up / subtree min crosses down"
    * exactly characterizes "some tick in the subtree crosses" — the
    * found tick evaluates the identical double predicate the join
    * form evaluates per pair, and the emitted returns are the same
    * pu/p0 − 1 expression tree, so the result is BIT-identical to
    * [[tripleBarrierCore]] (pinned in CoreOperatorsSpec) and the
    * DuckDB oracles are unchanged.
    *
    * Ties: (symbol, ts) is unique in the canonical trades view
    * (duplicate-ts events would make the join form's min_by/max_by
    * pick an arbitrary same-timestamp crossing; the scan picks the
    * (ts, trade_id)-first one — a superset of the join form's
    * guarantee, identical whenever ts is unique).
    */
  private[graft] def tripleBarrierCoreScan(
      df: DataFrame,
      horizon: String,
      ptMult: Double,
      slMult: Double,
      volSpan: Int,
      constTarget: Option[Double],
      c: TradingCols,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hUs = parseHorizonMicros(horizon)
    val dayUs = 86400000000L
    val hDays = ((hUs + dayUs - 1) / dayUs).toInt

    // degenerate-data guard (the volumeBarsOverflow precedent): null
    // prices/timestamps cannot ride a primitive-Double scan tuple —
    // the canonical trades view drops them at the source, this is the
    // operator-level backstop
    val clean = df.na.drop(Seq(c.price, c.ts))
    val lastTs = clean.groupBy(col(c.symbol)).agg(max(col(c.ts)).as("__last_ts"))
    val tid: Column =
      if (df.columns.contains(c.tradeId)) col(c.tradeId).cast("long") else lit(0L)
    val withTarget = constTarget match {
      case Some(x) =>
        clean.select(col(c.symbol), col(c.ts), col(c.price), tid.as("__tid"))
          .withColumn("trgt", lit(x))
      case None =>
        val vol = dailyVol(clean, volSpan, c)
          .withColumnRenamed("daily_return_volatility", "trgt")
        clean.select(col(c.symbol), col(c.ts), col(c.price), tid.as("__tid"))
          .join(vol, Seq(c.symbol, c.ts), "left")
    }
    val annotated = withTarget
      .join(broadcast(lastTs), Seq(c.symbol))
      .withColumn("__t1", least(col(c.ts) + expr(s"INTERVAL $horizon"), col("__last_ts")))
      .withColumn("__tsus", expr(s"unix_micros(${c.ts})"))
      .withColumn("__d", expr(s"unix_micros(${c.ts}) div ${dayUs}L"))
      .select(
        col(c.symbol).as("sym"),
        explode(
          filter(
            transform(sequence(lit(0), lit(hDays)), k => col("__d") - k.cast("long")),
            ch => (ch === col("__d")) || (col("__tsus") < (ch + lit(1L)) * lit(dayUs) + lit(hUs)),
          )
        ).as("chunk"),
        col("__tsus").as("tsus"),
        col(c.price).cast("double").as("price"),
        col("__tid").as("tid"),
        col("trgt"),
        col("__d").as("homeDay"),
        expr("unix_micros(__t1)").as("t1us"),
      )
      // halo copies are path-only: they are events in their HOME chunk
      .withColumn("trgt", when(col("chunk") === col("homeDay"), col("trgt")))
      .drop("homeDay")

    annotated
      .repartition(col("sym"), col("chunk"))
      .sortWithinPartitions(col("sym"), col("chunk"), col("tsus"), col("tid"))
      .as[(String, Long, Long, Double, Long, Option[Double], Long)]
      .mapPartitions { it =>
        val pt = ptMult
        val sl = slMult
        new Iterator[TbScanRow] {
          private val out = scala.collection.mutable.ArrayDeque.empty[TbScanRow]
          private var curSym: String = null
          private var curChunk = 0L
          private val tsA = new scala.collection.mutable.ArrayBuffer[Long]
          private val prA = new scala.collection.mutable.ArrayBuffer[Double]
          private val tgA = new scala.collection.mutable.ArrayBuffer[Double] // NaN = not an event
          private val t1A = new scala.collection.mutable.ArrayBuffer[Long]

          private def process(): Unit = {
            val n = tsA.length
            if (n == 0) return
            val ts = tsA.toArray
            val pr = prA.toArray
            val tg = tgA.toArray
            val t1 = t1A.toArray
            var sz = 1
            while (sz < n) sz <<= 1
            val mx = Array.fill(2 * sz)(Double.NegativeInfinity)
            val mn = Array.fill(2 * sz)(Double.PositiveInfinity)
            var i = 0
            while (i < n) {
              // a NaN price must never enable a crossing (NaN
              // comparisons are false in the join core) and must not
              // poison subtree aggregates (math.max(NaN, x) = NaN
              // would false-prune whole ranges): map it to the
              // never-crossing sentinel in each tree
              val pv = pr(i)
              mx(sz + i) = if (java.lang.Double.isNaN(pv)) Double.NegativeInfinity else pv
              mn(sz + i) = if (java.lang.Double.isNaN(pv)) Double.PositiveInfinity else pv
              i += 1
            }
            i = sz - 1
            while (i >= 1) {
              mx(i) = math.max(mx(2 * i), mx(2 * i + 1))
              mn(i) = math.min(mn(2 * i), mn(2 * i + 1))
              i -= 1
            }
            // first index with ts > x
            def upperBound(x: Long): Int = {
              var lo = 0
              var hi = n
              while (lo < hi) {
                val m = (lo + hi) >>> 1
                if (ts(m) <= x) lo = m + 1 else hi = m
              }
              lo
            }
            // leftmost index in [l, r] whose price satisfies pred,
            // pruned by subtree max (crossing up) or min (crossing down)
            def leftmost(l: Int, r: Int, useMax: Boolean, pred: Double => Boolean): Int = {
              def go(node: Int, nl: Int, nr: Int): Int = {
                if (nr < l || nl > r) return -1
                if (!pred(if (useMax) mx(node) else mn(node))) return -1
                if (nl == nr) return nl
                val m = (nl + nr) >>> 1
                val lf = go(2 * node, nl, m)
                if (lf >= 0) lf else go(2 * node + 1, m + 1, nr)
              }
              go(1, 0, sz - 1)
            }
            var lastTsSeen = Long.MinValue
            val seenPrices = new java.util.HashSet[java.lang.Double]()
            i = 0
            while (i < n) {
              val t = tg(i)
              if (!java.lang.Double.isNaN(t) && t > 0.0) {
                // the join core groups by (symbol, ts, price, trgt, t1):
                // duplicate event keys collapse to one output row
                if (ts(i) != lastTsSeen) { lastTsSeen = ts(i); seenPrices.clear() }
                if (seenPrices.add(pr(i))) {
                  val lo = upperBound(ts(i))
                  val hi = upperBound(t1(i)) - 1
                  if (lo <= hi) { // events with an empty (ts, t1] path drop out (inner join)
                    val p0 = pr(i)
                    if (p0 == 0.0) {
                      // degenerate event price: every pair return is null
                      out.append(TbScanRow(curSym, ts(i), p0, t, t1(i), None, None, None, None, None))
                    } else {
                      val thrP = t * pt
                      val thrS = (-t) * sl
                      // the tree descent's pruning is only valid when
                      // p/p0 − 1 is monotone NON-DECREASING in p, i.e.
                      // p0 > 0 (the data policy); a negative or NaN p0
                      // falls back to the exact linear scan, which
                      // evaluates the same per-pair predicates the
                      // join core does (NaN comparisons are false)
                      var kp = -1
                      var ks = -1
                      if (p0 > 0.0) {
                        kp = leftmost(lo, hi, useMax = true, p => (p / p0 - 1.0) >= thrP)
                        ks = leftmost(lo, hi, useMax = false, p => (p / p0 - 1.0) <= thrS)
                      } else {
                        var k = lo
                        while (k <= hi && (kp < 0 || ks < 0)) {
                          val r = pr(k) / p0 - 1.0
                          if (kp < 0 && r >= thrP) kp = k
                          if (ks < 0 && r <= thrS) ks = k
                          k += 1
                        }
                      }
                      out.append(
                        TbScanRow(
                          curSym,
                          ts(i),
                          p0,
                          t,
                          t1(i),
                          if (kp >= 0) Some(ts(kp)) else None,
                          if (ks >= 0) Some(ts(ks)) else None,
                          if (kp >= 0) Some(pr(kp) / p0 - 1.0) else None,
                          if (ks >= 0) Some(pr(ks) / p0 - 1.0) else None,
                          Some(pr(hi) / p0 - 1.0),
                        )
                      )
                    }
                  }
                }
              }
              i += 1
            }
            tsA.clear(); prA.clear(); tgA.clear(); t1A.clear()
          }

          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (sym, chunk, tsus, price, _, trgt, t1us) = it.next()
              if (curSym != null && (sym != curSym || chunk != curChunk)) process()
              curSym = sym
              curChunk = chunk
              tsA += tsus
              prA += price
              tgA += trgt.getOrElse(Double.NaN)
              t1A += t1us
            }
            if (out.isEmpty && !it.hasNext) process()
          }

          override def hasNext: Boolean = {
            if (out.isEmpty) advance()
            out.nonEmpty
          }

          override def next(): TbScanRow = {
            if (!hasNext) throw new NoSuchElementException
            out.removeHead()
          }
        }
      }
      .toDF()
      .select(
        col("symbol").as(c.symbol),
        timestamp_micros(col("ts_us")).as(c.ts),
        col("price").as(c.price),
        col("trgt"),
        timestamp_micros(col("t1_us")).as("t1"),
        timestamp_micros(col("pt_us")).as("pt_ts"),
        timestamp_micros(col("sl_us")).as("sl_ts"),
        col("pt_ret").as("__pt_ret"),
        col("sl_ret").as("__sl_ret"),
        col("v_ret").as("__v_ret"),
      )
  }

  /** AFML ch.3.6 meta-labeling: given a primary model's side (+1/-1)
    * per event, the meta-label is 1 when acting on that side would
    * have been profitable at the triple-barrier's first touch —
    * turning the secondary model into a bet-sizing filter. Pure
    * composition: triple-barrier output × side frame, one join.
    *
    * @param tb    tripleBarrier output (symbol, ts, touch_return, ...)
    * @param sides (symbol, ts, side) from the primary model
    */
  def metaLabel(
      tb: DataFrame,
      sides: DataFrame,
      c: TradingCols = TradingCols.default,
  ): DataFrame =
    tb.join(sides, Seq(c.symbol, c.ts))
      .withColumn(
        "meta_label",
        (col("side") * col("touch_return") > 0).cast("int"),
      )

  /** AFML ch.4.2 average-uniqueness sample weights: overlapping
    * labels share their ticks, so each event is weighted by the mean
    * of 1/concurrency over the ticks its label spans — de-biasing a
    * training set built from overlapping horizons.
    *
    * Plan shape: the event×tick pairing is the bucketed interval join
    * (fan-out bounded by horizon/bucket, the same machinery as the
    * barrier operators); concurrency is one count per covered tick;
    * the per-event mean folds 1/c in (ts, trade_id) order via a
    * sorted-array aggregate — sequential fold, so the double sum is
    * order-pinned and engine-exact (a plain SUM would drift with
    * aggregation order). Memory per event = its interval's tick
    * count; at 100 TB keep horizons bounded (they are label
    * horizons) or pre-aggregate per (event, day).
    *
    * @param events (symbol, t0, t1, event_id)
    */
  /** Return-attribution sample weights (AFML ch.4.10 snippet 4.10):
    * per event, |Σ_t ret_t / c_t| over the ticks of its lifespan,
    * where ret_t = ln(p_t / p_{t-1}) (per symbol, tick-over-tick) and
    * c_t = the number of concurrent events at tick t — events whose
    * information content is diluted by overlap weigh less, scaled by
    * the magnitude of the return they can claim.
    *
    * Same bucketed interval-join machinery as [[uniquenessWeights]];
    * the per-event Σ ret/c folds in (ts, trade_id) order (a parallel
    * double SUM would drift with partitioning; the ordered fold is
    * bit-stable and the oracle replays it with an ordered
    * list_reduce). Normalization to mean 1 (the reference's final
    * `* N / Σw` step) is the caller's: it is a two-value global
    * reduction whose float order the caller controls.
    */
  /** One (event, day-chunk) partial fold from the weight scan. */
  private[graft] final case class WeightPartial(
      symbol: String,
      event_id: Long,
      chunk: Long,
      part: Double,
      n: Long,
  )

  /** Shared scan core behind [[uniquenessWeights]] and
    * [[returnAttribution]]: per event, the ordered fold of
    * value/concurrency over the ticks its [t0, t1] interval covers —
    * WITHOUT materializing event×tick pairs. The pair form shuffles
    * O(q × ticks-per-interval) rows (quadratic in tick density:
    * measured 212-330 s at 100× density, §6e); this scan ships each
    * tick to its (symbol, day) chunk once and each event to the ≤
    * 1+interval/day chunks it touches, computes per-tick concurrency
    * by two binary searches over the chunk's event boundary arrays
    * (c_u = #{t0 ≤ u} − #{t1 < u}), folds each event's in-chunk tick
    * range in (ts, trade_id) order in compiled code, and emits ONE
    * partial row per (event, chunk).
    *
    * Fold tree contract: total = left-fold over per-chunk partials in
    * chunk order, each partial a left-fold from 0.0. For an event
    * whose interval sits inside one day (the common case) this is
    * BIT-identical to the flat pair-form fold (0.0 + p == p for the
    * p ≥ 0.0 / p ≠ -0.0 terms these operators produce); straddlers
    * get the regrouped tree, which the DuckDB oracles replay exactly
    * (per-chunk ordered list_reduce, then a chunk-ordered
    * list_reduce of partials).
    *
    * @param ticks  (symbol: string, tsus: long, tid: long, v: double)
    * @param events (symbol: string, t0us: long, t1us: long, event_id: long)
    * @return (symbol, event_id, s: chunk-folded Σ v/c, n_ticks)
    */
  private def intervalConcFold(ticks: DataFrame, events: DataFrame): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val dayUs = 86400000000L
    // kind 0 = event (a = t0us, b = t1us, id = event_id, v unused)
    // kind 1 = tick  (a = tsus,  b = 0,    id = trade_id, v = value)
    val evRows = events
      .where(col("t1us") >= col("t0us"))
      .select(
        col("symbol"),
        explode(sequence(expr(s"t0us div ${dayUs}L"), expr(s"t1us div ${dayUs}L"))).as("chunk"),
        lit(0).as("kind"),
        col("t0us").as("a"),
        col("t1us").as("b"),
        col("event_id").cast("long").as("id"),
        lit(0.0).as("v"),
      )
    val tkRows = ticks.select(
      col("symbol"),
      expr(s"tsus div ${dayUs}L").as("chunk"),
      lit(1).as("kind"),
      col("tsus").as("a"),
      lit(0L).as("b"),
      col("tid").as("id"),
      col("v"),
    )
    evRows
      .unionByName(tkRows)
      .repartition(col("symbol"), col("chunk"))
      .sortWithinPartitions(col("symbol"), col("chunk"), col("kind"), col("a"), col("id"))
      .as[(String, Long, Int, Long, Long, Long, Double)]
      .mapPartitions { it =>
        new Iterator[WeightPartial] {
          private val out = scala.collection.mutable.ArrayDeque.empty[WeightPartial]
          private var curSym: String = null
          private var curChunk = 0L
          private val e0 = new scala.collection.mutable.ArrayBuffer[Long] // t0, sorted (arrival order)
          private val e1 = new scala.collection.mutable.ArrayBuffer[Long] // t1, arrival order
          private val eid = new scala.collection.mutable.ArrayBuffer[Long]
          private val ts = new scala.collection.mutable.ArrayBuffer[Long]
          private val tv = new scala.collection.mutable.ArrayBuffer[Double]

          private def process(): Unit = {
            val q = e0.length
            val n = ts.length
            if (q > 0 && n > 0) {
              val t0s = e0.toArray // already ascending (sort key (kind, a, id))
              val t1arr = e1.toArray
              val t1s = t1arr.clone()
              java.util.Arrays.sort(t1s)
              val tsA = ts.toArray
              val tvA = tv.toArray
              // c_u = #{t0 <= u} - #{t1 < u}, both by binary search
              def countLe(arr: Array[Long], x: Long): Int = {
                var lo = 0
                var hi = arr.length
                while (lo < hi) {
                  val m = (lo + hi) >>> 1
                  if (arr(m) <= x) lo = m + 1 else hi = m
                }
                lo
              }
              def countLt(arr: Array[Long], x: Long): Int = {
                var lo = 0
                var hi = arr.length
                while (lo < hi) {
                  val m = (lo + hi) >>> 1
                  if (arr(m) < x) lo = m + 1 else hi = m
                }
                lo
              }
              val cArr = new Array[Double](n) // concurrency as double divisor
              var j = 0
              while (j < n) {
                cArr(j) = (countLe(t0s, tsA(j)) - countLt(t1s, tsA(j))).toDouble
                j += 1
              }
              var i = 0
              while (i < q) {
                val lo = countLt(tsA, t0s(i)) // first tick with ts >= t0 (inclusive start)
                val hi = countLe(tsA, t1arr(i)) - 1 // last tick with ts <= t1
                if (lo <= hi) {
                  var acc = 0.0
                  var k = lo
                  while (k <= hi) {
                    acc += tvA(k) / cArr(k)
                    k += 1
                  }
                  out.append(WeightPartial(curSym, eid(i), curChunk, acc, (hi - lo + 1).toLong))
                }
                i += 1
              }
            }
            e0.clear(); e1.clear(); eid.clear(); ts.clear(); tv.clear()
          }

          private def advance(): Unit = {
            while (out.isEmpty && it.hasNext) {
              val (sym, chunk, kind, a, b, id, v) = it.next()
              if (curSym != null && (sym != curSym || chunk != curChunk)) process()
              curSym = sym
              curChunk = chunk
              if (kind == 0) { e0 += a; e1 += b; eid += id }
              else { ts += a; tv += v }
            }
            if (out.isEmpty && !it.hasNext) process()
          }

          override def hasNext: Boolean = {
            if (out.isEmpty) advance()
            out.nonEmpty
          }

          override def next(): WeightPartial = {
            if (!hasNext) throw new NoSuchElementException
            out.removeHead()
          }
        }
      }
      .toDF()
      .groupBy(col("symbol"), col("event_id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("chunk"), col("part")))),
          lit(0.0),
          (acc, x) => acc + x.getField("part"),
        ).as("s"),
        sum(col("n")).cast("long").as("n_ticks"),
      )
  }

  /** @param bucket used only by the pair-materializing twin
    *               ([[returnAttributionPairs]]); the chunked-fold
    *               scan has no bucket parameter.
    */
  def returnAttribution(
      trades: DataFrame,
      events: DataFrame,
      bucket: String = "10 minutes",
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val w = Window.partitionBy(col(c.symbol)).orderBy(col(c.ts), col(c.tradeId))
    val ticks = trades
      .select(
        col(c.symbol).as("symbol"),
        unix_micros(col(c.ts)).as("tsus"),
        col(c.tradeId).cast("long").as("tid"),
        log(col(c.price) / lag(col(c.price), 1).over(w)).as("v"),
      )
      .where(col("v").isNotNull)
    val ev = events.select(
      col("symbol"),
      unix_micros(col("t0")).as("t0us"),
      unix_micros(col("t1")).as("t1us"),
      col("event_id"),
    )
    intervalConcFold(ticks, ev)
      .select(
        col("symbol"),
        col("event_id"),
        abs(col("s")).as("attribution"),
        col("n_ticks"),
      )
  }

  /** Pair-materializing twin of [[returnAttribution]] (quadratic in
    * tick density — kept for the equality pin and A/B benching).
    */
  private[graft] def returnAttributionPairs(
      trades: DataFrame,
      events: DataFrame,
      bucket: String = "10 minutes",
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val bucketUs = java.util.concurrent.TimeUnit.MINUTES.toMicros(
      bucket match {
        case s if s.endsWith("minutes") => s.stripSuffix("minutes").trim.toLong
        case other => throw new IllegalArgumentException(s"bucket: $other")
      }
    )
    val w = Window.partitionBy(col(c.symbol)).orderBy(col(c.ts), col(c.tradeId))
    val ticks = trades
      .select(
        col(c.symbol).as("symbol"),
        col(c.ts).as("ts"),
        col(c.tradeId).as("trade_id"),
        log(col(c.price) / lag(col(c.price), 1).over(w)).as("ret"),
      )
      .where(col("ret").isNotNull)
    val pairs = RangeJoin
      .intervalJoin(
        events.select(col("symbol"), col("t0"), col("t1"), col("event_id")),
        ticks,
        by = Seq("symbol"),
        startCol = "t0",
        endCol = "t1",
        pointCol = "ts",
        bucketMicros = bucketUs,
        inclusiveStart = true,
      )
      .select(col("symbol"), col("event_id"), col("ts"), col("trade_id"), col("ret"))
    val conc = pairs
      .groupBy(col("symbol"), col("ts"), col("trade_id"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(conc, Seq("symbol", "ts", "trade_id"))
      .groupBy(col("symbol"), col("event_id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(
            unix_micros(col("ts")).as("us"),
            col("trade_id").as("tid"),
            (col("ret") / col("c")).as("rc"),
          ))),
          lit(0.0),
          (acc, x) => acc + x.getField("rc"),
        ).as("__s"),
        count(lit(1)).as("n_ticks"),
      )
      .select(
        col("symbol"),
        col("event_id"),
        abs(col("__s")).as("attribution"),
        col("n_ticks"),
      )
  }

  /** @param bucket used only by the pair-materializing twin
    *               ([[uniquenessWeightsPairs]]); the chunked-fold
    *               scan has no bucket parameter.
    */
  def uniquenessWeights(
      trades: DataFrame,
      events: DataFrame,
      bucket: String = "10 minutes",
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val ticks = trades.select(
      col(c.symbol).as("symbol"),
      unix_micros(col(c.ts)).as("tsus"),
      col(c.tradeId).cast("long").as("tid"),
      lit(1.0).as("v"),
    )
    val ev = events.select(
      col("symbol"),
      unix_micros(col("t0")).as("t0us"),
      unix_micros(col("t1")).as("t1us"),
      col("event_id"),
    )
    intervalConcFold(ticks, ev)
      .select(
        col("symbol"),
        col("event_id"),
        (col("s") / col("n_ticks").cast("double")).as("avg_uniqueness"),
        col("n_ticks"),
      )
  }

  /** Time-decay sample weights (AFML ch.4.11): newest information
    * weighs most. Events are ordered by label end t1; x = cumulative
    * average uniqueness up to the event (so decay runs on INFORMATION
    * time, not wall clock); the weight is the line through
    * (x_N, 1) with d(0) = `lastWeight` (for lastWeight >= 0;
    * negative lastWeight zeroes the oldest fraction -lastWeight of
    * information time), clipped at 0.
    *
    * Exactness + scale: the cumulative sum runs over uniqueness
    * QUANTIZED to 1e-9 units (BIGINT headroom: |cumsum| <= n_events
    * x 1e9, safe to ~9e9 events) — a BIGINT cumsum is associative, so
    * the two-phase distributed pattern (range exchange on
    * (t1, event_id) → per-partition window + broadcast prefix
    * offsets; no single-task global window) is bit-identical to any
    * sequential fold, and the oracle replays the identical integers.
    * The decay line over x is the only FP tree, replicated op-for-op.
    */
  def timeDecayWeights(
      trades: DataFrame,
      events: DataFrame,
      lastWeight: Double = 0.5,
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    require(lastWeight > -1.0 && lastWeight <= 1.0, "lastWeight in (-1, 1]")
    val spark = trades.sparkSession
    val u = uniquenessWeights(trades, events, c = c)
    val evT1 = events.select(col("event_id"), unix_micros(col("t1")).as("__t1us"))
    val base = u
      .join(evT1, "event_id")
      .withColumn("__uq", round(col("avg_uniqueness") * lit(1e9)).cast("long"))
    val nParts = spark.sparkContext.defaultParallelism
    val ranged = graft.sources.Checkpoint.tableGated(
      base
        .repartitionByRange(nParts, col("__t1us"), col("event_id"))
        .withColumn("__pid", spark_partition_id()),
      "decay_ranked",
    )
    val parts = ranged
      .groupBy(col("__pid"))
      .agg(sum(col("__uq")).as("__s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val xn = parts.map(_._2).sum
    require(xn > 0, "time decay needs positive total uniqueness")
    val offs = parts
      .scanLeft((0, 0L, 0L)) { case ((_, off, s), (pid, ps)) => (pid, off + s, ps) }
      .tail
      .map { case (pid, off, _) => (pid, off) }
    val offDf = broadcast(spark.createDataFrame(offs.toSeq).toDF("__pid", "__off"))
    val wPart = Window
      .partitionBy(col("__pid"))
      .orderBy(col("__t1us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // decay line from exact integers; FP order fixed: slope first,
    // then const = 1 - slope*xN — the oracle writes the same tree
    val xnD = xn.toDouble / 1e9
    val slope =
      if (lastWeight >= 0) (1.0 - lastWeight) / xnD else 1.0 / ((lastWeight + 1.0) * xnD)
    val const = 1.0 - slope * xnD
    ranged
      .join(offDf, "__pid")
      .withColumn("__x", col("__off") + sum(col("__uq")).over(wPart))
      .select(
        col("symbol"),
        col("event_id"),
        col("avg_uniqueness"),
        greatest(lit(0.0), lit(const) + lit(slope) * (col("__x").cast("double") / lit(1e9)))
          .as("decay_weight"),
      )
  }

  /** Pair-materializing twin of [[uniquenessWeights]] (quadratic in
    * tick density — kept for the equality pin and A/B benching).
    */
  private[graft] def uniquenessWeightsPairs(
      trades: DataFrame,
      events: DataFrame,
      bucket: String = "10 minutes",
      c: TradingCols = TradingCols.default,
  ): DataFrame = {
    val bucketUs = java.util.concurrent.TimeUnit.MINUTES.toMicros(
      bucket match {
        case s if s.endsWith("minutes") => s.stripSuffix("minutes").trim.toLong
        case other => throw new IllegalArgumentException(s"bucket: $other")
      }
    )
    val ticks = trades.select(
      col(c.symbol).as("symbol"),
      col(c.ts).as("ts"),
      col(c.tradeId).as("trade_id"),
    )
    val pairs = RangeJoin
      .intervalJoin(
        events.select(col("symbol"), col("t0"), col("t1"), col("event_id")),
        ticks,
        by = Seq("symbol"),
        startCol = "t0",
        endCol = "t1",
        pointCol = "ts",
        bucketMicros = bucketUs,
        inclusiveStart = true,
      )
      .select(col("symbol"), col("event_id"), col("ts"), col("trade_id"))
    val conc = pairs
      .groupBy(col("symbol"), col("ts"), col("trade_id"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(conc, Seq("symbol", "ts", "trade_id"))
      .groupBy(col("symbol"), col("event_id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(
            unix_micros(col("ts")).as("us"),
            col("trade_id").as("tid"),
            (lit(1.0) / col("c")).as("inv"),
          ))),
          lit(0.0),
          (acc, x) => acc + x.getField("inv"),
        ).as("__sinv"),
        count(lit(1)).as("n_ticks"),
      )
      .select(
        col("symbol"),
        col("event_id"),
        (col("__sinv") / col("n_ticks").cast("double")).as("avg_uniqueness"),
        col("n_ticks"),
      )
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rate limiting and action-execution gates (reference: runtime/
  * ratelimit.c token bucket `interval`+`burst` keyed per source;
  * runtime/action.c:2257-2290 execOnlyEveryNthTime /
  * execOnlyOnceEveryInterval; runtime/action.c:172 "last message
  * repeated n times" reduction).
  *
  * Batch semantics: rsyslog's wall-clock token bucket maps onto event-time
  * interval windows — within each (key, interval-window), the first `burst`
  * messages pass, the rest are dropped (ratelimit.c's drop policy) with a
  * per-window discard summary. The per-key window ranking shuffles once on
  * (key, window) — the natural partitioning a 1000-executor run needs; no
  * global ordering is ever required.
  */
object RateLimit {

  /** Token-bucket pass/drop over event time. Returns the passed rows. */
  def apply(df: DataFrame, keyCol: Column, tsCol: Column, orderCol: Column,
            intervalSec: Int, burst: Int): DataFrame = {
    val winStart = (unix_timestamp(tsCol) / intervalSec).cast("long")
    val withWin = df.withColumn("rl_win", winStart)
    val w = Window.partitionBy(keyCol, col("rl_win")).orderBy(orderCol)
    withWin.withColumn("rl_seq", row_number().over(w))
      .filter(col("rl_seq") <= burst)
      .drop("rl_win", "rl_seq")
  }

  /** Drop summary: per (key, window) how many were passed vs discarded —
    * rsyslog emits "begin to drop" / "N messages dropped" marks. */
  def dropSummary(df: DataFrame, keyCol: Column, tsCol: Column,
                  intervalSec: Int, burst: Int): DataFrame = {
    df.withColumn("rl_win", (unix_timestamp(tsCol) / intervalSec).cast("long"))
      .groupBy(keyCol.as("key"), col("rl_win"))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("n_passed", least(col("n_total"), lit(burst.toLong)))
      .withColumn("n_dropped", col("n_total") - col("n_passed"))
  }

  /** action.execOnlyEveryNthTime: per key, every Nth call fires
    * (action.c:2257-2266 — counts calls, fires when count % N == 0). */
  def everyNth(df: DataFrame, keyCol: Column, orderCol: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    df.withColumn("gate_seq", row_number().over(w))
      .filter(col("gate_seq") % n === 0)
      .drop("gate_seq")
  }

  /** action.execOnlyOnceEveryInterval: first call per (key, interval)
    * fires (action.c:2280-2290). */
  def onceEveryInterval(df: DataFrame, keyCol: Column, tsCol: Column,
                        orderCol: Column, intervalSec: Int): DataFrame = {
    val withWin = df.withColumn("gate_win",
      (unix_timestamp(tsCol) / intervalSec).cast("long"))
    val w = Window.partitionBy(keyCol, col("gate_win")).orderBy(orderCol)
    withWin.withColumn("gate_seq", row_number().over(w))
      .filter(col("gate_seq") === 1)
      .drop("gate_win", "gate_seq")
  }

  /** "last message repeated n times" reduction (action.c msg-reduction):
    * collapse runs of consecutive identical messages per key into one row
    * + repeat count. Consecutive = adjacent in orderCol within key. */
  def repeatedMsgReduction(df: DataFrame, keyCol: Column, msgCol: Column,
                           orderCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    // run-id via the standard gaps-and-islands trick: count of
    // change-points up to each row
    val changed = when(lag(msgCol, 1).over(w).isNull ||
      lag(msgCol, 1).over(w) =!= msgCol, 1).otherwise(0)
    df.withColumn("chg", changed)
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keyCol.as("key"), col("run_id"))
      .agg(first(msgCol).as("msg"), // constant within a run by construction
        min(orderCol).as("first_seen"), count(lit(1)).as("n_repeats"))
      .drop("run_id")
  }
  /** Named-ratelimit policy application (runtime/ratelimit.c: the
    * object face behind `action.ratelimit.name` / input `ratelimit.name`).
    * Semantics per the reference, on the engine's event-time mapping
    * (wall-clock buckets ≙ aligned event-time windows, as documented on
    * this object):
    *
    *  - severity exemption: severity numerically BELOW the threshold
    *    (more urgent) bypasses limiting (ratelimit.c severity gate;
    *    -1 = all messages subject);
    *  - per-source limits: keyed buckets with per-key (max, window)
    *    resolved through the override table, exact-key match
    *    (ratelimit.c hashtable lookup); the key column is the rendered
    *    keyTemplate (default: fromhost);
    *  - global interval/burst applies to survivors as one logical bucket
    *    — its parallelism is the window count, which is the honest shape
    *    of a single shared counter (the reference pays a mutex there);
    *  - mode: "drop" removes excess rows; "pace" keeps them, marked —
    *    the delivery delay is transport-side (foreachBatch trigger
    *    pacing), so the engine's job is the classification.
    *
    * Returns the frame with an `rl_limited` boolean; `enforce` applies
    * the mode. */
  def applyPolicy(df: DataFrame, policy: graft.rainerscript.RatelimitPolicy.Policy,
                  keyCol: Column, tsCol: Column, ordCol: Column,
                  severityCol: Column = lit(7)): DataFrame = {
    val exempt =
      if (policy.severity >= 0) severityCol < policy.severity else lit(false)
    val afterPs = policy.perSource.filter(_.enabled) match {
      case Some(ps) =>
        // per-key (max, window) via the override table as literal
        // when-chains (bounded: override count is config-sized)
        val maxC = ps.overrides.foldRight(lit(ps.defaultMax)) { (o, acc) =>
          when(keyCol === o.key, lit(o.max.getOrElse(ps.defaultMax)))
            .otherwise(acc)
        }
        val winC = ps.overrides.foldRight(lit(ps.defaultWindowSec)) { (o, acc) =>
          when(keyCol === o.key,
            lit(o.windowSec.getOrElse(ps.defaultWindowSec))).otherwise(acc)
        }
        val win = floor(unix_timestamp(tsCol) / winC).cast("long")
        // severity-exempt rows bypass WITHOUT consuming bucket budget
        // (the reference's severity gate skips the counter entirely), so
        // the sequence is a conditional running count of subject rows
        val w = Window.partitionBy(keyCol, win).orderBy(ordCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("rl_ps_seq",
            sum(when(!exempt, 1L).otherwise(0L)).over(w))
          .withColumn("rl_limited",
            !exempt && col("rl_ps_seq") > maxC)
          .drop("rl_ps_seq")
      case None => df.withColumn("rl_limited", lit(false))
    }
    if (policy.intervalSec > 0) {
      val gwin = floor(unix_timestamp(tsCol) / policy.intervalSec)
        .cast("long")
      // the global bucket counts only rows still in flight — a
      // conditional running count, NOT row_number (which would let
      // exempt/already-limited rows consume budget)
      val qualify = !col("rl_limited") && !exempt
      val w = Window.partitionBy(gwin).orderBy(ordCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = afterPs.withColumn("rl_g_seq",
        when(qualify, sum(when(qualify, 1L).otherwise(0L)).over(w)))
      ranked.withColumn("rl_limited",
          col("rl_limited") ||
            (col("rl_g_seq").isNotNull && col("rl_g_seq") > policy.burst))
        .drop("rl_g_seq")
    } else afterPs
  }

  /** Apply the policy's mode: drop removes limited rows; pace keeps the
    * full frame (rl_limited marks what the transport must pace). */
  def enforce(df: DataFrame, policy: graft.rainerscript.RatelimitPolicy.Policy): DataFrame =
    if (policy.mode == "pace") df
    else df.filter(!col("rl_limited")).drop("rl_limited")

  /** queue.discardMark / queue.discardSeverity load shedding
    * (runtime/queue.c qqueueChkDiscardMsg:2761-2787 + the Stage-3
    * load-shedding design note :126-129): when the queue holds at least
    * `discardMark` entries, an arriving message with severity >=
    * `discardSeverity` (numerically less important) is discarded before
    * enqueue; lower-severity (critical) messages always pass. 8 = off,
    * like the reference default (:2696).
    *
    * Spark face: the instantaneous queue depth is the platform's
    * backpressure signal, so the engine expresses the POLICY over an
    * overload indicator — here the event-time arrival window whose
    * message count reaches discardMark (the same saturation the C queue
    * sees at its enqueue mutex, made deterministic and replayable).
    * One shuffle on the window key; no global state.
    *
    * Returns the frame with a `shed` flag; callers drop `shed` rows and
    * count them (ctrNFDscrd). */
  def discardShed(df: DataFrame, tsCol: Column, severityCol: Column,
                  discardMark: Long, discardSeverity: Int,
                  windowDur: String = "1 minute"): DataFrame = {
    val win = window(tsCol, windowDur)
    val depth = count(lit(1)).over(Window.partitionBy(win))
    df.withColumn("shed",
      lit(discardSeverity < 8) && depth >= discardMark &&
        severityCol >= discardSeverity)
  }
}

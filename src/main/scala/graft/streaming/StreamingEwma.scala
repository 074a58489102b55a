package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders => SparkEncoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig, TimerValues, ValueState}

/** Per-key observation for the streaming EWMA chart; `seq` is the
  * caller's unique per-key tie-break — the [[KalmanEvent]] contract. */
final case class EwmaEvent(key: String, ts: java.sql.Timestamp,
                           value: Double, seq: Long = 0L)

/** Chart state: the x₁-seeded smoother `y`, the decay power
  * `p = (1−λ)^t`, and the seed `x1` — the exact triple the batch
  * composition carries implicitly (var_ema + runprod + first_value). */
final case class EwmaChartState(hasY: Boolean, y: Double, p: Double,
                                x1: Double)

/** One monitored point: `ewma` is the μ0-seeded smoothed level, with the
  * time-varying control limits and the out-of-control flag. */
final case class EwmaChartPoint(key: String, ts: java.sql.Timestamp,
                                value: Double, ewma: Double, ucl: Double,
                                lcl: Double, ooc: Boolean)

/** Streaming twin of [[graft.operators.Rolling.ewmaChart]] with EXPLICIT
  * SPC targets: batch estimates (μ0, σ) from the whole series — a
  * streaming monitor cannot, so the caller supplies them (the standard
  * phase-I-then-phase-II SPC workflow: calibrate on history with the
  * batch op, monitor live with these targets).
  *
  * The fold carries the batch composition's EXACT intermediates
  * (`y = var_ema(x, λ)` seeded at x₁, `p = (1−λ)^t` by repeated
  * multiplication, `z = y + p·(μ0 − x₁)`), so a key replayed with the
  * SAME (μ0, σ) is BIT-IDENTICAL to the batch chart — the spec asserts
  * it. State is three doubles + a flag per key. `λ` is permille, the
  * batch convention; `l`/`mu0`/`sigma` are plain doubles (plan-time
  * literals in the batch twin). */
object StreamingEwma {

  def ewmaChart(events: Dataset[EwmaEvent], lambdaPm: Int = 200,
                l: Double = 3.0, mu0: Double = 0.0,
                sigma: Double = 1.0): Dataset[EwmaChartPoint] = {
    require(lambdaPm >= 1 && lambdaPm <= 999,
      s"lambda permille must be in [1,999], got $lambdaPm")
    require(l > 0.0 && sigma >= 0.0)
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new EwmaProcessor(lambdaPm, l, mu0, sigma),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch replay through the identical fold — the gate's entry point. */
  def ewmaChartBatch(events: Dataset[EwmaEvent], lambdaPm: Int = 200,
                     l: Double = 3.0, mu0: Double = 0.0,
                     sigma: Double = 1.0): Dataset[EwmaChartPoint] = {
    require(lambdaPm >= 1 && lambdaPm <= 999,
      s"lambda permille must be in [1,999], got $lambdaPm")
    require(l > 0.0 && sigma >= 0.0)
    import events.sparkSession.implicits._
    events.groupByKey(_.key).flatMapGroups { (key, rows) =>
      scorePath(key, rows, lambdaPm, l, mu0, sigma,
        EwmaChartState(hasY = false, 0.0, 1.0, 0.0))._2.iterator
    }
  }

  /** Shared fold mirroring the batch column trees node-for-node:
    * `y' = λx + (1−λ)y` (seed x), `p' = p·(1−λ)` (seed 1 → first row
    * (1−λ), the runprod shape), `z = y + p·(μ0 − x1)`,
    * `hw = (L·σ)·√(ratio·(1 − p·p))`. */
  private def scorePath(key: String, rows: Iterator[EwmaEvent],
                        lambdaPm: Int, l: Double, mu0: Double,
                        sigma: Double, st0: EwmaChartState)
      : (EwmaChartState, Seq[EwmaChartPoint]) = {
    val lam = lambdaPm / 1000.0
    val om = 1.0 - lam
    val ratio = lam / (2.0 - lam)
    var st = st0
    val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.seq))
      .map { e =>
        st =
          if (!st.hasY) EwmaChartState(hasY = true, e.value, st.p * om,
            e.value)
          else EwmaChartState(hasY = true, lam * e.value + om * st.y,
            st.p * om, st.x1)
        val z = st.y + st.p * (mu0 - st.x1)
        val hw = (l * sigma) * math.sqrt(ratio * (1.0 - st.p * st.p))
        EwmaChartPoint(key, e.ts, e.value, z, mu0 + hw, mu0 - hw,
          math.abs(z - mu0) > hw)
      }
    (st, out)
  }

  private[streaming] class EwmaProcessor(lambdaPm: Int, l: Double,
                                         mu0: Double, sigma: Double)
      extends StatefulProcessor[String, EwmaEvent, EwmaChartPoint] {
    @transient private var state: ValueState[EwmaChartState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EwmaChartState](
        "ewmaChart", SparkEncoders.product[EwmaChartState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[EwmaEvent],
                                 timerValues: TimerValues)
        : Iterator[EwmaChartPoint] = {
      val st0 = if (state.exists()) state.get()
        else EwmaChartState(hasY = false, 0.0, 1.0, 0.0)
      val (st, out) = scorePath(key, rows, lambdaPm, l, mu0, sigma, st0)
      state.update(st)
      out.iterator
    }
  }
}

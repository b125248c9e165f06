package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series smoothing/forecasting over keyed daily series (Holt's
  * linear-trend double exponential smoothing — the workhorse one step up
  * from a moving average, and the base of Holt-Winters).
  *
  * Scale shape: the recursion is sequential IN TIME but embarrassingly
  * parallel ACROSS KEYS — `groupByKey(key).flatMapGroups` puts each
  * series on one task, and a series is census-sized by construction
  * (one row per key per day: years of daily history is O(10³) rows),
  * so the in-memory sort inside a group is bounded. This is the same
  * envelope contract as the gap-fill/LOCF and EWMA ops.
  *
  * Determinism: the recursion is pure IEEE double arithmetic, so given
  * bit-identical inputs both engines (Spark vs the oracle's recursive
  * CTE) produce bit-identical states; callers must round the INPUT
  * series (daily sums are summation-order-dependent) before fitting.
  * α/β should be dyadic rationals (0.5, 0.25) so the literals are exact
  * in binary on both sides.
  */
object Forecast {

  // Not `private`: the Dataset encoder's generated projection code
  // constructs these reflectively and can't reach private members.
  case class In(key: String, t: Long, y: Double)
  case class Out(key: String, t: Long, level: Double, trend: Double,
      forecast: Double)

  case class HwOut(key: String, t: Long, level: Double, trend: Double,
      seasonal: Double, forecast: Double)

  /** Additive Holt–Winters triple exponential smoothing per key — the
    * canonical seasonal forecaster one step up from [[holt]]. Classic
    * two-season initialization (Hyndman & Athanasopoulos §7.3, level =
    * season-1 mean, trend = (season-2 mean − season-1 mean)/m, seasonal
    * indices = season-1 deviations), recursion from t = m+1:
    *
    *   ℓ_t = α(y_t − s_{t−m}) + (1−α)(ℓ_{t−1} + b_{t−1})
    *   b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(y_t − ℓ_t) + (1−γ)s_{t−m}
    *
    * `forecast` at t is the one-step-ahead ŷ_{t+1} = ℓ_t + b_t +
    * s_{t+1−m}. Keys with fewer than 2m+1 observations are dropped
    * (not enough history to initialize). Same envelope as [[holt]]
    * (sequential in time, parallel across keys, census-sized groups);
    * same determinism contract: round the input series and use dyadic
    * α/β/γ; init statistics are computed in fixed index order and
    * ROUNDED to 6, so the oracle's pivoted init chain and recursive
    * CTE walk identical IEEE arithmetic. */
  def holtWinters(df: DataFrame, keyCol: String, tCol: String, yCol: String,
      period: Int, alpha: Double, beta: Double, gamma: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.PortableRounding.{round => pr}
    df.select(col(keyCol).cast("string").as("key"), col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y"))
      .as[In]
      .groupByKey(_.key)
      .flatMapGroups { (key, rows) =>
        val s = rows.toArray.sortBy(_.t)
        if (s.length < 2 * period + 1) Iterator.empty
        else {
          // fixed-order season means (left-assoc, mirrored by the
          // oracle's pivoted (y1+…+y7)/7 chain)
          var a1 = 0.0
          var i = 0
          while (i < period) { a1 += s(i).y; i += 1 }
          a1 /= period
          var a2 = 0.0
          i = period
          while (i < 2 * period) { a2 += s(i).y; i += 1 }
          a2 /= period
          var l = pr(a1, 6)
          var b = pr((pr(a2, 6) - l) / period, 6)
          var q = Array.tabulate(period)(j => pr(s(j).y - l, 6))
          val out = Array.newBuilder[HwOut]
          i = period
          while (i < s.length) {
            val y = s(i).y
            val q1 = q(0)
            val lnew = alpha * (y - q1) + (1.0 - alpha) * (l + b)
            val bnew = beta * (lnew - l) + (1.0 - beta) * b
            val snew = gamma * (y - lnew) + (1.0 - gamma) * q1
            q = q.drop(1) :+ snew
            out += HwOut(key, s(i).t, lnew, bnew, snew, lnew + bnew + q(0))
            l = lnew
            b = bnew
            i += 1
          }
          out.result().iterator
        }
      }
      .toDF("key", "t", "level", "trend", "seasonal", "forecast")
  }

  case class CIn(key: String, t: Long, z: Double)
  case class COut(key: String, t: Long, spos: Double, sneg: Double, alarm: Int)

  /** Two-sided CUSUM changepoint statistic per key (Page 1954): over a
    * pre-standardized series z,
    *   S⁺_t = max(0, S⁺_{t-1} + z_t − drift)
    *   S⁻_t = max(0, S⁻_{t-1} − z_t − drift)
    * with S⁺₀ = S⁻₀ = 0; `alarm` = 1 when either side exceeds
    * `threshold`. Same envelope as [[holt]]: sequential in time,
    * parallel across keys, census-sized series per group. Callers must
    * ROUND z before fitting and use dyadic `drift`/`threshold` so both
    * engines walk identical IEEE arithmetic. */
  def cusum(df: DataFrame, keyCol: String, tCol: String, zCol: String,
      drift: Double, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"), col(tCol).cast("long").as("t"),
        col(zCol).cast("double").as("z"))
      .as[CIn]
      .groupByKey(_.key)
      .flatMapGroups { (key, rows) =>
        val series = rows.toArray.sortBy(_.t)
        var sp = 0.0
        var sn = 0.0
        series.iterator.map { r =>
          sp = math.max(0.0, sp + r.z - drift)
          sn = math.max(0.0, sn - r.z - drift)
          COut(key, r.t, sp, sn, if (sp > threshold || sn > threshold) 1 else 0)
        }
      }
      .toDF("key", "t", "spos", "sneg", "alarm")
  }

  /** Holt's linear method per key. Input columns: `keyCol` (string),
    * `tCol` (long, consecutive time index within key), `yCol` (double,
    * pre-rounded). Init: level₁ = y₁, trend₁ = y₂ − y₁ (series of
    * length 1 emit trend 0). `forecast` is the one-step-ahead forecast
    * made AT t (i.e. for t+1): level + trend. */
  def holt(df: DataFrame, keyCol: String, tCol: String, yCol: String,
      alpha: Double, beta: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"), col(tCol).cast("long").as("t"),
        col(yCol).cast("double").as("y"))
      .as[In]
      .groupByKey(_.key)
      .flatMapGroups { (key, rows) =>
        val series = rows.toArray.sortBy(_.t)
        if (series.isEmpty) Iterator.empty
        else {
          var level = series(0).y
          var trend = if (series.length > 1) series(1).y - series(0).y else 0.0
          val out = Array.newBuilder[Out]
          out += Out(key, series(0).t, level, trend, level + trend)
          var i = 1
          while (i < series.length) {
            val prevLevel = level
            level = alpha * series(i).y + (1.0 - alpha) * (level + trend)
            trend = beta * (level - prevLevel) + (1.0 - beta) * trend
            out += Out(key, series(i).t, level, trend, level + trend)
            i += 1
          }
          out.result().iterator
        }
      }
      .toDF("key", "t", "level", "trend", "forecast")
  }
}

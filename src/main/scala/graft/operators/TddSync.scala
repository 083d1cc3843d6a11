package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TDD-frame correlation / alignment (reference `corr_along_axis0`,
  * `sync_pfp_to_frame`, `make_3gpp_downlink_mask` —
  * /root/reference/demos/3gpp_detect_and_sync.ipynb cell 4).
  *
  * For each periodic-frame-power trace: correlate the linear-power trace
  * against candidate downlink mask templates at every circular lag, take the
  * argmax over (lag, template) -> (shift, peak correlation, frame format),
  * then circularly roll the trace by its shift to align frame boundaries.
  *
  * Implementation: a scalar UDF over the `array<float>` trace cell. At the
  * reference's sizes (n=560 samples, m=2 templates) direct O(n^2 m)
  * correlation is ~0.6M multiply-adds per row — cheaper than FFT setup and
  * embarrassingly parallel per row (no shuffle). This is the one place the
  * engine uses a Scala UDF: the kernel is an argmax over a quadratic loop,
  * outside what Catalyst expressions express efficiently (SURVEY §2.5 W4).
  */
object TddSync {

  /** Build a TDD downlink mask: `n` samples over one frame, 1.0 where the
    * frame fraction falls in a downlink interval. The two standard formats
    * the reference distinguishes are encoded by their DL duty patterns.
    */
  def downlinkMask(n: Int, intervals: Seq[(Double, Double)]): Array[Double] = {
    val m = new Array[Double](n)
    var i = 0
    while (i < n) {
      val frac = i.toDouble / n
      m(i) = if (intervals.exists { case (a, b) => frac >= a && frac < b }) 1.0 else 0.0
      i += 1
    }
    m
  }

  /** Default two-format template set (TDD DL-heavy vs balanced pattern). */
  def defaultTemplates(n: Int): Seq[Array[Double]] = Seq(
    downlinkMask(n, Seq((0.0, 0.6), (0.7, 0.8))),
    downlinkMask(n, Seq((0.0, 0.3), (0.5, 0.8))))

  /** Circular cross-correlation argmax of a dB trace against templates.
    * Returns (bestShift, bestPeak, bestTemplate).
    */
  def correlate(traceDb: Array[Float], templates: Seq[Array[Double]]): (Int, Double, Int) = {
    val n = traceDb.length
    // dB -> linear power (reference dBtopow before correlating)
    val lin = new Array[Double](n)
    var i = 0
    while (i < n) { lin(i) = math.pow(10.0, traceDb(i) / 10.0); i += 1 }
    var bestShift = 0; var bestPeak = Double.NegativeInfinity; var bestTpl = 0
    var t = 0
    while (t < templates.length) {
      val tpl = templates(t)
      var lag = 0
      while (lag < n) {
        var acc = 0.0
        var j = 0
        while (j < n) {
          acc += lin((j + lag) % n) * tpl(j)
          j += 1
        }
        if (acc > bestPeak) { bestPeak = acc; bestShift = lag; bestTpl = t }
        lag += 1
      }
      t += 1
    }
    (bestShift, bestPeak, bestTpl)
  }

  /** Circular roll (reference np.roll with negative shift = align start). */
  def roll(trace: Array[Float], shift: Int): Array[Float] = {
    val n = trace.length
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = trace((i + shift) % n); i += 1 }
    out
  }

  /** Add sync columns to a DataFrame with an `array<float>` dB trace column:
    * `shift` (int), `corr_peak` (double, linear), `frame_format` (int),
    * `aligned` (rolled trace).
    */
  def syncTraces(df: DataFrame, traceCol: String, nTemplates: Int = 2): DataFrame = {
    val corrUdf = udf { trace: Seq[Float] =>
      val arr = trace.toArray
      val (s, p, t) = correlate(arr, defaultTemplates(arr.length))
      (s, p, t)
    }
    val rollUdf = udf { (trace: Seq[Float], shift: Int) =>
      roll(trace.toArray, shift).toSeq
    }
    df.withColumn("__sync", corrUdf(col(traceCol)))
      .withColumn("shift", col("__sync._1"))
      .withColumn("corr_peak", col("__sync._2"))
      .withColumn("frame_format", col("__sync._3"))
      .withColumn("aligned", rollUdf(col(traceCol), col("shift")))
      .drop("__sync")
  }
}

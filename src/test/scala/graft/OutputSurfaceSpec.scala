package graft

import org.apache.spark.sql.types._

/** Output-surface lint: EVERY registry query's top-level schema must be
  * gradable by the driver's canonicalizer, which loads the parquet into
  * pandas, sorts the raw frame, and hashes values. Two surfaces are known
  * to break that pipeline (both shipped in round 10 and were the round's
  * only reds):
  *
  *   - a NESTED column (LIST/STRUCT/MAP) — pandas `sort_values` throws
  *     `unhashable type: numpy.ndarray` (multimodal_bmp_hist);
  *   - a DECIMAL wider than 18 digits — the hasher converts through
  *     double and the two engines round the conversion 1 ulp apart on
  *     11+-digit values (metric_cusum; same class as the round-6
  *     profile_correlations incident).
  *
  * Round 12 proved the 18-digit bound too lax: `q62_unpivot` (18,4) and
  * `lake_cow_prune` (18,2) both passed this lint and BOTH went driver-red
  * on hash with values of 12-14 significant digits, while their
  * same-surface siblings passed by value-luck. The provably-safe bound is
  * precision ≤ 15: the unscaled integer of any DECIMAL(≤15, s) is < 2^53,
  * so it converts to double EXACTLY and the subsequent divide by the
  * exact power of ten is correctly rounded by IEEE — every engine path
  * (string parse, int128 descale, pandas) lands on the identical double.
  * At 16+ digits the int→double step itself rounds, and double-rounding
  * paths can disagree by 1 ulp.
  *
  * So the rule, enforced here instead of living in comments: top-level
  * columns are scalars, and any decimal is ≤ 15 precision. Wide-decimal
  * math is fine INTERNALLY — surface it as a canonical string (the
  * q40_decimal_canary precedent) or descale it. A future query that
  * genuinely needs an exception must name itself in [[allow]] with a
  * reason, which keeps the exception loud and reviewed.
  *
  * `tools/oracle_check.py` carries the mirror lint on the oracle replica
  * side, so the local harness is exactly as strict as the driver.
  */
class OutputSurfaceSpec extends SparkSuite {

  /** name -> reason. Empty on purpose: nothing on the board needs one. */
  private val allow: Map[String, String] = Map.empty

  private def violations(dt: DataType, path: String): Seq[String] = dt match {
    case _: ArrayType | _: StructType | _: MapType =>
      Seq(s"$path: nested ${dt.simpleString} (driver sort_values cannot hash it)")
    case d: DecimalType if d.precision > 15 =>
      Seq(s"$path: ${d.simpleString} (>15 precision; values beyond 2^53 unscaled " +
        "don't round-trip double deterministically — render as string, cast to " +
        "double, or descale)")
    case _ => Nil
  }

  test("every registry query surfaces only driver-gradable top-level columns") {
    val bad = SparkEntry.registry.flatMap { case (name, q) =>
      if (allow.contains(name)) Nil
      else {
        val df = q.fn(spark, sfDir)
        df.schema.fields.toSeq.flatMap(f => violations(f.dataType, f.name))
          .map(v => s"$name -> $v")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n  ", "\n  ", ""))
  }
}

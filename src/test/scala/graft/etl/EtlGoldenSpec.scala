package graft.etl

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden end-to-end test: run the full pipeline on the reference's own
  * adversarial fixtures (vendored under fixtures/) and assert the exact
  * cleaned tables + quality-log contents, hand-derived from the reference
  * semantics (SURVEY §2 is the de-facto spec; FIXTURES.md catalogues what
  * each row exercises).
  */
class EtlGoldenSpec extends SparkSpec {

  private lazy val result = EtlPipeline.runDefault(spark)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ------------------------------------------------------------ patients
  test("patients: 12 raw rows → 11 cleaned (P-0002 dup dropped)") {
    assert(result.patients.count() === 11)
    // duplicate id kept-first: the surviving p-0002 is the FIRST (68in/150lb)
    val p2 = result.patients.filter(col("patient_id") === "p-0002")
      .select("height_cm", "weight_kg").collect()
    assert(p2.length === 1)
    assert(p2(0).getDouble(0) === 172.72)
    assert(math.abs(p2(0).getDouble(1) - 68.0388) < 1e-9)
  }

  test("patients: height normalization (P3) covers every unit form") {
    val h = result.patients.select("patient_id", "height_cm").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(h("p-0001") === 170.0) // "170 cm"
    assert(h("p-0002") === 172.72) // "68 in"
    assert(h("p-0003") === 162.0) // bare "162" >= 3 ⇒ cm
    // 5*30.48 + 6*2.54 — same IEEE result as the reference's Python floats
    assert(math.abs(h("p-0005") - 167.64) < 1e-9) // "5ft 6in"
    assert(h("p-0009") === 177.8) // "70 in"
    assert(h("p-0010") === 165.0) // "165cm" no space
    assert(h("p-0011") === 170.0) // bare "170"
  }

  test("patients: weight normalization (P4) incl. BMI inference + flip") {
    val w = result.patients.select("patient_id", "weight_kg").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(w("p-0001") === Some(65.0)) // explicit kg
    assert(w("p-0003") === Some(54.5)) // unitless, BMI ⇒ kg
    assert(w("p-0007") === None) // "N/A" missing marker
    assert(w("p-0008") === Some(300.0)) // implausible BMI 62.0, unfixable, kept
    assert(w("p-0005").exists(v => math.abs(v - 130 * 0.453592) < 1e-9)) // "130lb"
  }

  test("patients: sex → ISO 5218 (P5)") {
    val s = result.patients.select("patient_id", "sex_iso").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(s("p-0001") === 2) // F
    assert(s("p-0002") === 1) // M
    assert(s("p-0007") === 9) // O
    assert(s("p-0008") === 0) // U
  }

  test("patients: dob two-pass parse (P6) incl. day-first fallback") {
    val d = result.patients.select("patient_id", "dob_parsed").collect()
      .map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    assert(d("p-0001") === Some(ts("1987-03-14 00:00:00")))
    assert(d("p-0002") === Some(ts("1990-12-31 00:00:00"))) // 12/31/1990 M/d
    assert(d("p-0003") === Some(ts("1985-12-31 00:00:00"))) // 31-12-1985 d-M
    assert(d("p-0004") === None) // blank → unparseable
    assert(d("p-0005") === Some(ts("1999-07-01 00:00:00"))) // 1999/07/01
    assert(d("p-0006") === Some(ts("2008-02-29 00:00:00"))) // leap day
  }

  test("patients: clean_utf8 last — lowercase + NFKC, unicode survives") {
    val names = result.patients.select("given_name", "family_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(names.contains(("alice", "müller")))
    assert(names.contains(("chloé", "dubois")))
    assert(names.contains(("gül", "yılmaz")))
    assert(names.contains(("李", "雷")))
    assert(names.contains(("david", "o'neil")))
  }

  test("patients: quality log — the 7 hand-derived anomalies") {
    val pl = result.logs.filter(col("filename") === "patients.csv")
    val byReason = pl.groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byReason === Map(
      "missing_unit_assumed_kg" -> 2, // P-0003, P-0011
      "missing_marker" -> 1, // P-0007 N/A
      "implausible_bmi_62.0" -> 1, // P-0008 300kg@220cm
      "unknown_or_missing" -> 1, // P-0008 sex U
      "unparseable_date" -> 1, // P-0004 blank dob
      "duplicate_removed" -> 1)) // P-0002 second row
    // sex log schema inconsistency: U-case logs cleaned_value, not mapped_code
    val sexRow = pl.filter(col("reason") === "unknown_or_missing").collect()(0)
    assert(sexRow.getAs[String]("cleaned_value") === "0")
    assert(sexRow.getAs[String]("mapped_code") === null)
  }

  // ---------------------------------------------------------- encounters
  test("encounters: messy reader (S2) — 9 data rows survive, 8 after dedup") {
    assert(result.encounters.count() === 8)
    // the ;-delimited 7-field row was truncated and parsed
    val e200 = result.encounters.filter(col("encounter_id") === "enc-000200").collect()
    assert(e200.length === 1)
    assert(e200(0).getAs[String]("source_file") === "encounters_c.csv")
    assert(e200(0).getAs[String]("encounter_type") === "outpatient")
  }

  test("encounters: tz-safe datetime parse (P7) — offsets → UTC instants") {
    val a = result.encounters.select("encounter_id", "admit_dt", "discharge_dt")
      .collect().map(r => r.getString(0) -> (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)))).toMap
    assert(a("enc-000100")._1 === Some(ts("2024-12-30 09:00:00"))) // +01:00
    assert(a("enc-000100")._2 === Some(ts("2025-01-02 13:30:00")))
    assert(a("enc-000101")._1 === Some(ts("2024-12-31 08:00:00"))) // M/d/yyyy naive
    assert(a("enc-000102")._1 === Some(ts("2024-12-31 09:15:00"))) // d-M-yyyy
    assert(a("enc-000103")._1 === Some(ts("2024-11-05 09:00:00"))) // T..Z lowercased
    assert(a("enc-000104")._1 === Some(ts("2025-01-03 07:30:00"))) // yyyy/M/d
  }

  test("encounters: F2 nullify + F3 missing-discharge + LOS (P9)") {
    val m = result.encounters
      .select("encounter_id", "discharge_dt", "length_of_stay_hours").collect()
      .map(r => r.getString(0) -> (Option(r.getTimestamp(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // discharge<admit (enc-000103) nullified, so LOS null
    assert(m("enc-000103") === (None, None))
    // empty discharge cell (enc-000105) → null, LOS null
    assert(m("enc-000105") === (None, None))
    assert(m("enc-000100")._2 === Some(76.5))
    assert(m("enc-000101")._2 === Some(12.0))
    assert(m("enc-000102")._2 === Some(2.75))
  }

  test("encounters: quality log — dup pair + F2 + two F3 rows") {
    val el = result.logs.filter(col("filename").startsWith("encounters"))
    val byReason = el.groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byReason === Map(
      "duplicate_encounter_id" -> 2, // keep=False logs BOTH members
      "discharge_before_admit" -> 1,
      "missing_discharge" -> 2)) // the F2-nullified row fires F3 too
    // D2 logs carry the per-row source_file, not the csv name
    val dupFiles = el.filter(col("reason") === "duplicate_encounter_id")
      .select("filename").collect().map(_.getString(0)).sorted
    assert(dupFiles === Array("encounters_a.csv", "encounters_dup.csv"))
  }

  // ----------------------------------------------------------- diagnoses
  test("diagnoses: XML scan (S3) + fills (P10/P11 elif quirk) + dedup (D3)") {
    assert(result.diagnoses.count() === 8) // all have codes, keys unique
    val rows = result.diagnoses.collect()
      .map(r => r.getAs[String]("encounter_id") -> r).toMap
    // missing encounterId → UNKNOWN (lowercased by final clean_utf8)
    assert(rows.contains("unknown"))
    val unk = rows("unknown")
    assert(unk.getAs[String]("code") === "e66.9")
    // ELIF quirk: filled encounter_id ⇒ is_primary stays NULL
    assert(unk.getAs[Any]("is_primary") === null)
    // present encounter_id + missing is_primary ⇒ filled false
    val j069 = result.diagnoses.filter(col("code") === "j06.9").collect()(0)
    assert(j069.getAs[Boolean]("is_primary") === false)
    // attribute extraction
    assert(unk.getAs[String]("code_system") === "icd-10")
  }

  test("diagnoses: recordedAt ISO parse — offset, date-only, naive, future") {
    val t = result.diagnoses.select("code", "recorded_at").collect()
      .map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    assert(t("e11.9") === Some(ts("2024-12-31 12:05:00"))) // +01:00 → UTC
    assert(t("g44") === Some(ts("2024-12-31 00:00:00"))) // date-only fallback
    assert(t("zzz") === Some(ts("2025-01-05 11:10:00"))) // naive
    assert(t("n39.0") === Some(ts("2035-01-01 00:00:00"))) // future kept
  }

  test("logs: unified union schema, 12 total rows, lowercased") {
    assert(result.logs.columns.toSeq === QualityLog.columns)
    assert(result.logs.count() === 12)
    // log table itself went through clean_utf8: reasons already lowercase,
    // original_value "N/A" → "n/a"
    val na = result.logs.filter(col("reason") === "missing_marker").collect()(0)
    assert(na.getAs[String]("original_value") === "n/a")
  }
}

package graft

import java.sql.Timestamp
import graft.streaming.EventStream

/** Pins the watermark late-data discipline of st_late_data on a
  * crafted replay where every behavior is represented:
  *
  *  - a straggler whose window closed before batch 1's watermark is
  *    DROPPED (its window still emits — with only the on-time rows);
  *  - a straggler inside the 1-hour allowance is aggregated late
  *    (KEPT, merged into its window alongside on-time rows);
  *  - windows ending after the final watermark are WITHHELD.
  *
  * The fixture is built so the split rule inside EventStream.lateData
  * (cut = maxTs - 6h; stragglers = event_id % 20 == 0) lands every row
  * in the intended batch. */
class LateDataSpec extends SparkSpec {

  // timeline (one day; global max 23:30:30 so cut1 = 11:30:30 and
  //   cut2 = 17:30:30; minute-offset so no boundary ever ties):
  //   batch 0 (ts <= cut1): 10:10, 10:20, 11:20:10 (= chunk max ->
  //     late-event watermark for batch 2 = 10:20:10)
  //   batch 1 (cut1 < ts <= cut2): 16:30, 17:20:10
  //   batch 2: straggler 09:15 (window end 10:00 <= 10:20:10 -> DROP;
  //     its window never emits at all), straggler 10:15 (end 11:00 >
  //     wm -> KEPT, merges with batch 0's [10:00) rows), straggler
  //     16:45 (KEPT, merges with 16:30), fresh 18:05, 22:10, 23:30:30
  //     (final watermark 22:30:30; windows [22:00) and [23:00) end
  //     after it -> WITHHELD)
  private lazy val fixtureDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_latedata_" +
      java.util.UUID.randomUUID().toString.take(8)
    def at(hms: String) = Timestamp.valueOf(s"2024-03-05 $hms")
    import spark.implicits._
    Seq(
      (1L, at("10:10:00"), 7L, "view", 1.0, "{}"),
      (2L, at("10:20:00"), 7L, "view", 1.0, "{}"),
      (3L, at("11:20:10"), 7L, "view", 1.0, "{}"),
      (4L, at("16:30:00"), 7L, "view", 1.0, "{}"),
      (8L, at("17:20:10"), 7L, "view", 1.0, "{}"),
      (20L, at("09:15:00"), 7L, "view", 3.0, "{}"), // dropped straggler
      (40L, at("10:15:00"), 7L, "view", 5.0, "{}"), // kept straggler
      (60L, at("16:45:00"), 7L, "view", 7.0, "{}"), // kept straggler
      (5L, at("18:05:00"), 7L, "view", 1.0, "{}"),
      (6L, at("22:10:00"), 7L, "view", 1.0, "{}"),
      (7L, at("23:30:30"), 7L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events_out")
    val p = java.nio.file.Paths.get(dir)
    val part = java.nio.file.Files.list(p.resolve("events_out"))
      .filter(f => f.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.move(part, p.resolve("events.parquet"))
    dir
  }

  test("st_late_data drops, keeps, and withholds exactly as specified") {
    val got = EventStream.lateData(spark, fixtureDir)
      .collect()
      .map(r => r.getTimestamp(0).toString.take(13) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap
    val expected = Map(
      // no "09" row: the 09:15 straggler was dropped, window empty
      "2024-03-05 10" -> (3L, 7.0),  // straggler 10:15 kept + merged
      "2024-03-05 11" -> (1L, 1.0),
      "2024-03-05 16" -> (2L, 8.0),  // straggler 16:45 kept + merged
      "2024-03-05 17" -> (1L, 1.0),
      "2024-03-05 18" -> (1L, 1.0))  // 22:xx / 23:xx withheld
    assert(got == expected, got.toString)
  }
}

package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the window-function sessionizer must agree with a
  * direct single-machine reference model on arbitrary event streams —
  * including ties on ts and gaps exactly at the threshold. */
class SessionizePropertySpec extends AnyFunSuite {
  import TestSpark._

  private val GapUs = 1800L * 1000000L
  private val Base = 1704067200000000L // 2024-01-01T00:00Z in micros

  /** Reference model: sort by (ts, id), count gap starts per user. */
  private def model(evs: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    evs.groupBy(_._3).map { case (user, es) =>
      val sorted = es.map(e => (e._2, e._1)).sorted // (us, id)
      var sessions = 0L
      var last = Long.MinValue
      sorted.foreach { case (us, _) =>
        if (last == Long.MinValue || us - last > GapUs) sessions += 1
        last = us
      }
      user -> (sessions, es.size.toLong)
    }

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 4L)
      // offsets cluster around multiples of the gap to hit the
      // ==threshold and ±1µs edges often
      slot <- Gen.choose(0L, 5L)
      jitter <- Gen.oneOf(-1L, 0L, 1L, 17L, 999999L)
      us = Base + slot * GapUs + jitter
    } yield (user, us))
  } yield evs.zipWithIndex.map { case ((u, us), i) => (i.toLong, us, u) }

  test("sessionize matches the reference model on random streams") {
    import spark.implicits._
    (1 to 15).foreach { trial =>
      val evs = eventsGen.pureApply(Gen.Parameters.default, Seed(trial.toLong))
      val df = evs.map { case (id, us, user) =>
        (id, new Timestamp(us / 1000).toInstant
          .plusNanos((us % 1000) * 1000) match {
            case inst => Timestamp.from(inst)
          }, user, "e", 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = operators.Events.sessionizeFrame(df).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
      assert(got === model(evs), s"trial $trial: $evs")
    }
  }
}

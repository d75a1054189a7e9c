package graft.core

import org.scalatest.funsuite.AnyFunSuite

class NotificationsSpec extends AnyFunSuite {

  test("formatDuration matches python str(timedelta) exactly") {
    assert(Notifications.formatDuration(0) == "0:00:00")
    assert(Notifications.formatDuration(61) == "0:01:01")
    assert(Notifications.formatDuration(3661) == "1:01:01") // unpadded hour
    assert(Notifications.formatDuration(86401) == "1 day, 0:00:01")
    assert(Notifications.formatDuration(2 * 86400) == "2 days, 0:00:00")
    assert(Notifications.formatDuration(-5) == "-1 day, 23:59:55") // python floor-mod
  }

  test("runMessage formats the reference's success notification") {
    val msg = Notifications.runMessage("dag_x", "2026-08-12", "Finished",
      Some(1000L), Some(3_662_000L))
    assert(msg ==
      "*Dag*: dag_x\n*Parameter Date*: 2026-08-12\n*Total Time*: 1:01:01\n*Msg*: Finished")
    // missing dates -> the reference's differently-padded default literal
    val dflt = Notifications.runMessage("dag_x", "2026-08-12", "Finished", None, None)
    assert(dflt.contains("*Total Time*: 00:00:00"))
  }

  test("failureMessage formats the reference's Slack failure block") {
    val msg = Notifications.failureMessage("t1", "dag_x", "2026-08-12", "2026-08-12T10:00:00Z",
      "http://logs/x")
    assert(msg ==
      ":x: *Task Failed*\n*Task*: t1\n*Dag*: dag_x\n*Parameter Date*: 2026-08-12\n" +
        "*Execution Date*: 2026-08-12T10:00:00Z\n<http://logs/x|*View Logs*>")
  }

  test("notified emits success on return, failure + rethrow on exception") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val out = Notifications.notified("j", "2026-08-12", seen.append(_)) { 42 }
    assert(out == 42)
    assert(seen.size == 1 && seen.head.startsWith("*Dag*: j\n") && seen.head.contains("*Msg*: Finished"))
    seen.clear()
    val e = intercept[RuntimeException] {
      Notifications.notified("j", "2026-08-12", seen.append(_)) { throw new RuntimeException("boom") }
    }
    assert(e.getMessage == "boom")
    assert(seen.size == 1 && seen.head.startsWith(":x: *Task Failed*"))
  }
}

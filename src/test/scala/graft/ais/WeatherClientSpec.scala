package graft.ais

import org.scalatest.funsuite.AnyFunSuite

/** Pins the HTTP client's retry/drop policy (SURVEY §7.4.3) through the
  * fetch seam — no network involved. */
class WeatherClientSpec extends AnyFunSuite {

  private val okBody =
    """{"location":{"name":"Bergen","region":"Vestland","country":"Norway"},
       "current":{"condition":{"text":"Clear"},"temp_f":55.0,"wind_mph":8.0,
       "wind_dir":"NW"}}"""

  private class Scripted(responses: (Int, String)*)
      extends HttpWeatherClient("k", minIntervalMs = 0L) {
    var calls = 0
    private val it = responses.iterator
    override protected def fetch(uri: java.net.URI): (Int, String) = {
      calls += 1
      if (it.hasNext) it.next() else throw new java.io.IOException("exhausted")
    }
  }

  test("transient 5xx retries then succeeds") {
    val c = new Scripted((500, ""), (503, ""), (200, okBody))
    val w = c.current(60.0, 5.0)
    assert(c.calls == 3)
    assert(w.exists(_.locale == "Bergen"))
    assert(w.exists(_.condition == "Clear"))
  }

  test("permanent 4xx drops without retrying") {
    val c = new Scripted((401, "bad key"))
    assert(c.current(60.0, 5.0).isEmpty)
    assert(c.calls == 1)
  }

  test("429 is treated as transient") {
    val c = new Scripted((429, ""), (200, okBody))
    assert(c.current(60.0, 5.0).nonEmpty)
    assert(c.calls == 2)
  }

  test("I/O failures retry up to the cap then give up") {
    val c = new Scripted() // every fetch throws
    assert(c.current(60.0, 5.0).isEmpty)
    assert(c.calls == 3) // initial + 2 retries
  }

  test("error bodies and incomplete responses drop (reference consumer:42-50)") {
    val c1 = new Scripted((200, """{"error":{"message":"quota"}}"""))
    assert(c1.current(60.0, 5.0).isEmpty)
    val c2 = new Scripted((200, """{"location":{"name":"X"}}"""))
    assert(c2.current(60.0, 5.0).isEmpty)
  }
}

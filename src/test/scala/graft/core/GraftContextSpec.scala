package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** TelluricContext parity (tests/test_telluric_context.py): one-level
  * scope, two-level overlay + restore, thread isolation, exception-safe
  * restore. */
class GraftContextSpec extends AnyFunSuite {

  test("one level: options visible inside, cleared after (test:4-11)") {
    GraftContext.scoped("a" -> 1, "c" -> "stam", "d" -> Map("a" -> "a")) {
      assert(GraftContext.get("a") === Some(1))
      assert(GraftContext.get("c") === Some("stam"))
      assert(GraftContext.get("d") === Some(Map("a" -> "a")))
    }
    assert(GraftContext.options.isEmpty)
  }

  test("two levels: inner overlays, outer restores (test:14-27)") {
    GraftContext.scoped("a" -> 1, "b" -> 2, "c" -> "stam") {
      GraftContext.scoped("a" -> 4, "x" -> "something") {
        assert(GraftContext.get("a") === Some(4))
        assert(GraftContext.get("b") === Some(2))
        assert(GraftContext.get("c") === Some("stam"))
        assert(GraftContext.get("x") === Some("something"))
      }
      assert(GraftContext.get("a") === Some(1))
      assert(GraftContext.get("x") === None)
    }
    assert(GraftContext.options.isEmpty)
  }

  test("threads are isolated (test:30-56)") {
    @volatile var ok1 = false
    @volatile var ok2 = false
    val t1 = new Thread(() => GraftContext.scoped("a" -> 1) {
      Thread.sleep(50)
      ok1 = GraftContext.get("a") == Some(1) && GraftContext.get("x").isEmpty
    })
    val t2 = new Thread(() => GraftContext.scoped("a" -> 4, "x" -> 13) {
      ok2 = GraftContext.get("a") == Some(4) && GraftContext.get("x") == Some(13)
    })
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(ok1 && ok2)
    assert(GraftContext.options.isEmpty)
  }

  test("restore survives an exception; getInt coerces strings") {
    intercept[RuntimeException] {
      GraftContext.scoped("k" -> 9) { throw new RuntimeException("boom") }
    }
    assert(GraftContext.options.isEmpty)
    GraftContext.scoped("n" -> "42", "l" -> 3L) {
      assert(GraftContext.getInt("n", 0) === 42)
      assert(GraftContext.getInt("l", 0) === 3) // any Number coerces
      assert(GraftContext.getInt("missing", 7) === 7)
    }
    GraftContext.scoped("bad" -> "lots") {
      val e = intercept[IllegalArgumentException](GraftContext.getInt("bad", 0))
      assert(e.getMessage.contains("bad")) // names the malformed key
    }
  }
}

package graft.util

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

class MemoSpec extends AnyFunSuite {

  test("builder runs exactly once under concurrent first access") {
    val calls = new AtomicInteger(0)
    val memo = new Memo[String, Int]
    val threads = (1 to 16).map { _ =>
      new Thread(() => {
        val v = memo.getOrElseUpdate("k", {
          Thread.sleep(10) // widen the race window
          calls.incrementAndGet()
        })
        assert(v == 1)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(calls.get() == 1)
    assert(memo.getOrElseUpdate("k", calls.incrementAndGet()) == 1)
    assert(calls.get() == 1)
  }

  test("distinct keys build independently") {
    val memo = new Memo[Int, String]
    assert(memo.getOrElseUpdate(1, "a") == "a")
    assert(memo.getOrElseUpdate(2, "b") == "b")
    assert(memo.getOrElseUpdate(1, "c") == "a")
  }
}

package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class ResilienceSpec extends AnyFunSuite {
  import Resilience._

  test("backoff: base·2^n capped at max, ±10% jitter bounds") {
    val cfg = RetryConfig()
    assert(backoffDelay(cfg, 0) == 1.0) // jitterU=0.5 is the centre
    assert(backoffDelay(cfg, 1) == 2.0)
    assert(backoffDelay(cfg, 5) == 32.0)
    assert(backoffDelay(cfg, 10) == 60.0) // cap
    assert(math.abs(backoffDelay(cfg, 0, jitterU = 1.0) - 1.1) <= 1e-9)
    assert(math.abs(backoffDelay(cfg, 0, jitterU = 0.0) - 0.9) <= 1e-9)
  }

  test("withRetries: transient errors retried, then succeeds") {
    var calls = 0
    val out = withRetries(sleep = _ => ())(() => {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    })
    assert(out == "ok" && calls == 3)
  }

  test("withRetries: non-retryable errors fail fast") {
    var calls = 0
    intercept[IllegalArgumentException] {
      withRetries(sleep = _ => ())(() => {
        calls += 1
        throw new IllegalArgumentException("bad input")
      })
    }
    assert(calls == 1)
  }

  test("withRetries: retry budget exhausts") {
    var calls = 0
    intercept[RuntimeException] {
      withRetries(RetryConfig(maxRetries = 2), sleep = _ => ())(() => {
        calls += 1
        throw new RuntimeException("always")
      })
    }
    assert(calls == 3) // initial + 2 retries
  }

  test("circuit breaker: opens at threshold, half-opens after timeout, closes after successes") {
    var now = 0.0
    val cb = new CircuitBreaker(failureThreshold = 3, timeoutSec = 10.0,
      successesToClose = 2, clock = () => now)

    def fail(): Unit = intercept[RuntimeException](cb.call(() => throw new RuntimeException("x")))
    fail(); fail()
    assert(cb.allowRequest) // 2 < threshold
    fail()
    assert(!cb.allowRequest) // OPEN
    intercept[CircuitOpenException](cb.call(() => "nope"))

    now = 11.0 // past timeout → HALF_OPEN
    assert(cb.allowRequest)
    assert(cb.call(() => "a") == "a")
    assert(cb.call(() => "b") == "b") // 2 successes → CLOSED
    // fresh failures needed to re-open
    fail(); fail()
    assert(cb.allowRequest)
  }

  test("circuit breaker: half-open failure re-opens immediately") {
    var now = 0.0
    val cb = new CircuitBreaker(failureThreshold = 1, timeoutSec = 5.0,
      successesToClose = 2, clock = () => now)
    intercept[RuntimeException](cb.call(() => throw new RuntimeException("x")))
    assert(!cb.allowRequest)
    now = 6.0
    assert(cb.allowRequest) // HALF_OPEN
    intercept[RuntimeException](cb.call(() => throw new RuntimeException("y")))
    assert(!cb.allowRequest) // straight back to OPEN
  }
}

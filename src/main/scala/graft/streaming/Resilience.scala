package graft.streaming

/** Driver-side failure-handling guards (SURVEY.md §2.9 T3): retry with
  * exponential backoff + jitter and a circuit breaker, mirroring the
  * reference's semantics (`dags/dag.py:121-257`). These protect the
  * pipeline RUNNER (driver orchestration); per-task retries inside a
  * job belong to Spark itself (`spark.task.maxFailures`).
  */
object Resilience {

  /** `dags/dag.py:94-96,121-125`: max 3 attempts, delay base·2ⁿ capped
    * at 60 s, ±10 % jitter.
    */
  case class RetryConfig(
      maxRetries: Int = 3,
      baseDelaySec: Double = 1.0,
      maxDelaySec: Double = 60.0,
      jitterFrac: Double = 0.1)

  /** Deterministic core of the backoff schedule (jitter applied by the
    * caller's RNG so tests can pin it).
    */
  def backoffDelay(cfg: RetryConfig, attempt: Int, jitterU: Double = 0.5): Double = {
    val base = math.min(cfg.baseDelaySec * math.pow(2.0, attempt), cfg.maxDelaySec)
    base * (1.0 + cfg.jitterFrac * (2.0 * jitterU - 1.0))
  }

  /** Non-retryable classification (`dags/dag.py:197-228`): data/config
    * errors fail fast; transient infra errors retry.
    */
  def isRetryable(t: Throwable): Boolean = t match {
    case _: java.io.FileNotFoundException => false
    case _: SecurityException => false
    case _: IllegalArgumentException => false
    case _: NullPointerException => false
    case _ => true
  }

  /** Run `f` with the reference's retry policy. `sleep` is injectable
    * so tests don't wait; the default really sleeps.
    */
  def withRetries[T](cfg: RetryConfig = RetryConfig(),
      rng: scala.util.Random = new scala.util.Random(42),
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong))(f: () => T): T = {
    var attempt = 0
    while (true) {
      try return f()
      catch {
        case t: Throwable if isRetryable(t) && attempt < cfg.maxRetries =>
          sleep(backoffDelay(cfg, attempt, rng.nextDouble()))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** CLOSED/OPEN/HALF_OPEN circuit breaker
    * (`dags/dag.py:85-97,127-188`): opens after `failureThreshold`
    * consecutive failures, half-opens after `timeoutSec`, closes again
    * after `successesToClose` consecutive half-open successes. Clock is
    * injectable for tests.
    */
  final class CircuitBreaker(
      failureThreshold: Int = 5,
      timeoutSec: Double = 300.0,
      successesToClose: Int = 2,
      clock: () => Double = () => System.nanoTime() / 1e9) {

    sealed trait State
    case object Closed extends State
    case object Open extends State
    case object HalfOpen extends State

    private var st: State = Closed
    private var failures = 0
    private var halfOpenSuccesses = 0
    private var openedAt = 0.0

    def state: State = {
      if (st == Open && clock() - openedAt >= timeoutSec) {
        st = HalfOpen
        halfOpenSuccesses = 0
      }
      st
    }

    def allowRequest: Boolean = state != Open

    def recordSuccess(): Unit = state match {
      case HalfOpen =>
        halfOpenSuccesses += 1
        if (halfOpenSuccesses >= successesToClose) { st = Closed; failures = 0 }
      case _ => failures = 0
    }

    def recordFailure(): Unit = state match {
      case HalfOpen =>
        st = Open; openedAt = clock()
      case _ =>
        failures += 1
        if (failures >= failureThreshold) { st = Open; openedAt = clock() }
    }

    /** Guarded call: throws CircuitOpenException without invoking `f`
      * while open (`dags/dag.py:150-160`).
      */
    def call[T](f: () => T): T = {
      if (!allowRequest) throw new CircuitOpenException
      try { val r = f(); recordSuccess(); r }
      catch { case t: Throwable => recordFailure(); throw t }
    }
  }

  final class CircuitOpenException extends RuntimeException("circuit breaker is OPEN")
}

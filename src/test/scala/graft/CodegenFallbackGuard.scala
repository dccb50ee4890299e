package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** JVM-wide log sentinel that fails the test run if Catalyst ever
  * silently drops an expression to interpreted mode.
  *
  * Round 6b (ImbalanceBars BarRow/RunBarRow) and round 8
  * (Microstructure EntropyDayRow) both shipped the same bug: a
  * JVM-`private` case class used as a scan-output row makes Janino
  * unable to call the accessors, so `CodeGeneratorWithInterpretedFallback`
  * logs "Expr codegen error and falling back to interpreter mode" at
  * WARN and the query runs — correct but interpreted, which is exactly
  * the throughput loss the scan rewrites exist to avoid. This guard
  * makes that class of bug un-shippable: [[SparkSpec]] installs the
  * appender before any Spark work and asserts zero hits in `afterAll`,
  * so the suite that triggered the fallback is the one that fails.
  */
object CodegenFallbackGuard {
  /** Substrings of Spark WARN/ERROR messages that indicate a silent
    * codegen failure. Matched against the formatted log message.
    */
  private val patterns = Seq(
    // CodeGeneratorWithInterpretedFallback (spark-catalyst): projection /
    // predicate / ordering generation threw and was retried interpreted.
    "falling back to interpreter mode",
    // WholeStageCodegenExec: generated code failed to compile and the
    // whole stage re-planned without codegen.
    "Whole-stage codegen disabled for plan",
    // CodeGenerator.compile: Janino rejected the generated source (ERROR,
    // logged before the interpreted retry — e.g. a JVM-private case
    // class accessor the generated code cannot call).
    "Failed to compile the generated Java code",
  )

  private val hits = new ConcurrentLinkedQueue[String]()
  @volatile private var installed = false

  /** Idempotent; attach a WARN-threshold appender to the root logger. */
  def install(): Unit = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val appender = new AbstractAppender(
        "graft-codegen-fallback-guard", null, null, true, Property.EMPTY_ARRAY) {
        override def append(event: LogEvent): Unit = {
          val msg = event.getMessage.getFormattedMessage
          if (patterns.exists(msg.contains)) {
            val thrown = Option(event.getThrown).map(t => s" [${t.getMessage}]").getOrElse("")
            hits.add(s"${event.getLoggerName}: $msg$thrown")
          }
        }
      }
      appender.start()
      val config = ctx.getConfiguration
      config.getRootLogger.addAppender(appender, Level.WARN, null)
      ctx.updateLoggers()
      installed = true
    }
  }

  def snapshot(): Seq[String] = hits.asScala.toSeq

  /** Throws (failing the calling suite) if any fallback was logged
    * since the last clean check; drains so one bug fails one suite.
    */
  def assertClean(suite: String): Unit = {
    val found = snapshot()
    if (found.nonEmpty) {
      hits.clear()
      throw new AssertionError(
        s"Codegen fallback detected during $suite (an expression is running " +
          s"interpreted — see CodegenFallbackGuard):\n  ${found.mkString("\n  ")}")
    }
  }
}

package graft.tools

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

import scala.collection.mutable

/** Attributes whole-stage-codegen compile failures to the query that was
  * running when they fired.
  *
  * Why this exists: Spark's codegen path fails SOFT. When janino rejects a
  * generated class (64 KB method limit, constant-pool overflow, deep
  * expression nesting), `CodeGenerator.compile` logs the janino stack trace
  * at ERROR and `WholeStageCodegenExec` / `Predicate.create` silently fall
  * back to interpreted execution — hashes stay green, the bench line shows
  * no failure, and the only evidence is an unattributed stack trace in the
  * log tail (exactly what BENCH_r11 recorded). At 100 TB an interpreted
  * fallback on a hot operator is a multiplicative slowdown, so the bench
  * must make it VISIBLE and ATTRIBUTED, not just survivable.
  *
  * Mechanism: a programmatic log4j2 appender on the root logger captures
  * events from the codegen package (and any event whose throwable chain
  * contains a janino class), tagging each with the query name the bench
  * set via [[setCurrent]]. No log4j2 config file changes; the appender is
  * additive and removed by [[uninstall]].
  */
object CodegenMonitor {
  @volatile private var current: String = "(outside-query)"
  private val hits = mutable.LinkedHashMap[String, Int]()
  private val firstMsg = mutable.LinkedHashMap[String, String]()
  private var appender: Option[AbstractAppender] = None
  // (logger name → level before install), so uninstall() can restore the
  // two codegen loggers instead of leaving them chattier than it found
  // them (round-13 ADVICE fix)
  private var priorLevels: Seq[(String, Level)] = Seq.empty

  private val openedLoggers = Seq(
    "org.apache.spark.sql.catalyst.expressions.codegen",
    "org.apache.spark.sql.execution.WholeStageCodegenExec")

  def setCurrent(name: String): Unit = { current = name }

  private def isCodegenEvent(ev: LogEvent): Boolean = {
    val ln = Option(ev.getLoggerName).getOrElse("")
    if (ln.contains("expressions.codegen") || ln.endsWith("WholeStageCodegenExec")) {
      // compile failures only — the codegen logger also emits benign DEBUG
      // source dumps; at WARN+ everything it says is a failure of some kind
      ev.getLevel.isMoreSpecificThan(Level.WARN)
    } else {
      var t = ev.getThrown
      var depth = 0
      while (t != null && depth < 8) {
        if (t.getClass.getName.startsWith("org.codehaus")) return true
        t = t.getCause; depth += 1
      }
      false
    }
  }

  def install(): Unit = synchronized {
    if (appender.isDefined) return
    val app = new AbstractAppender(
        "graft-codegen-monitor", null, null, false, Property.EMPTY_ARRAY) {
      override def append(ev: LogEvent): Unit = {
        if (isCodegenEvent(ev)) {
          val q = current
          hits.synchronized {
            hits(q) = hits.getOrElse(q, 0) + 1
            if (!firstMsg.contains(q)) {
              val m = Option(ev.getMessage).map(_.getFormattedMessage).getOrElse("")
              val t = Option(ev.getThrown).map(th => s" [${th.getClass.getSimpleName}: ${th.getMessage}]").getOrElse("")
              firstMsg(q) = (m.linesIterator.take(1).mkString + t).take(300)
            }
          }
        }
      }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(app, Level.WARN, null)
    // The bench session runs the root logger at ERROR (stray WARNs corrupt
    // the captured JSON line), which would also suppress the fallback WARN
    // from WholeStageCodegenExec before it reaches any appender. Open just
    // the two codegen loggers to WARN — their events reach this appender
    // (and the console, which is acceptable: a codegen fallback SHOULD be
    // loud) while the rest of Spark stays at ERROR.
    // record the EFFECTIVE level (inherited or explicit — never null) so
    // restore is a plain setLevel; pinning the inherited value explicitly
    // is fine: what matters is the verbosity, not the config topology
    priorLevels = openedLoggers.map(ln => ln -> cfg.getLoggerConfig(ln).getLevel)
    openedLoggers.foreach(ln =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(ln, Level.WARN))
    ctx.updateLoggers()
    appender = Some(app)
  }

  def uninstall(): Unit = synchronized {
    appender.foreach { app =>
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      ctx.getConfiguration.getRootLogger.removeAppender(app.getName)
      // restore the two codegen loggers install() opened to WARN: a null
      // prior means the logger had no explicit config before — null in
      // Configurator.setLevel re-inherits from the parent, undoing ours
      priorLevels.foreach { case (ln, lv) =>
        org.apache.logging.log4j.core.config.Configurator.setLevel(ln, lv)
      }
      priorLevels = Seq.empty
      ctx.updateLoggers()
      app.stop()
    }
    appender = None
  }

  /** (query → fallback-log-event count), insertion-ordered. */
  def snapshot: Seq[(String, Int)] = hits.synchronized { hits.toSeq }
  def messages: Seq[(String, String)] = hits.synchronized { firstMsg.toSeq }
  def reset(): Unit = hits.synchronized { hits.clear(); firstMsg.clear() }
}

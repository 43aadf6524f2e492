package graft.plans

import graft.functions.CosineSimilarity
import graft.lineage.{Lineage, LineageListener}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** One-line enablement of the whole engine surface:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * injects the custom Catalyst functions (`graft_cosine`) into every new
  * session's registry and attaches the lineage listener on the session's
  * first analyzed query (SparkSessionExtensions has no session-ready
  * hook, so the check-rule builder — which does receive the session — is
  * the injection point; installation is once-per-session, the rule itself
  * is a no-op on every plan).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(CosineSimilarity.descriptor)
    ext.injectFunction(graft.functions.DotProduct.descriptor)
    ext.injectFunction(graft.functions.SqDist.descriptor)
    ext.injectFunction(graft.functions.HashFns.h60Descriptor)
    ext.injectFunction(graft.functions.BloomFns.bloomAggDescriptor)
    ext.injectFunction(graft.functions.BloomFns.bloomContainsDescriptor)
    ext.injectOptimizerRule(_ => DimAutoBroadcast)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectCheckRule { session =>
      val listener = GraftExtensions.ensureListener(session)
      // Streaming lineage attaches LAZILY, on the first analyzed plan
      // that is actually streaming: spark.streams.addListener pins the
      // session's streaming listener bus onto the context-wide
      // LiveListenerBus with no automatic detach, so auto-installing it
      // on every session would leak one bus registration per churned
      // session in long-lived JVMs. Sessions that never stream never
      // touch the shared bus.
      plan => if (plan.isStreaming) graft.lineage.Lineage.attachStreaming(session, listener)
    }
  }
}

object GraftExtensions {
  // Weak keys: a long-lived JVM that churns through sessions
  // (newSession() per job, Thrift server) must not have every session
  // pinned against GC by this registry. The listener value holds no
  // reference back to the session, so the entry dies with the session.
  // Collections.synchronizedMap overrides computeIfAbsent with a
  // synchronized delegate, so once-per-session install stays atomic.
  private val installed: java.util.Map[SparkSession, LineageListener] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, LineageListener]())

  private[graft] def ensureListener(session: SparkSession): LineageListener =
    installed.computeIfAbsent(session, s => Lineage.installBatch(s))

  /** The listener attached to `session` by the extension, if any (tests). */
  def listenerFor(session: SparkSession): Option[LineageListener] =
    Option(installed.get(session))

  /** Live entry count — for leak specs only (weak entries vanish on GC). */
  private[graft] def installedCount: Int = installed.size()
}

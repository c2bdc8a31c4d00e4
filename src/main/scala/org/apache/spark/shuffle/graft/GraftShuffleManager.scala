package org.apache.spark.shuffle.graft

import org.apache.spark.SparkConf
import org.apache.spark.shuffle.sort.SortShuffleManager

/** Pluggable shuffle-manager stand-in — the remote-shuffle-service
  * design-compat surface (the reference ships gluten-celeborn /
  * gluten-uniffle modules that integrate Celeborn/Uniffle precisely
  * through the `spark.shuffle.manager` extension point). The
  * `ShuffleManager` SPI is `private[spark]`, so, exactly like
  * Celeborn's own `SparkShuffleManager`, the implementation lives
  * under `org.apache.spark.shuffle.*` — that packaging IS the
  * integration pattern an RSS uses.
  *
  * Delegates to the built-in sort manager; what it proves is the
  * contract: the engine's whole query surface (shuffled joins,
  * partial/final aggregation, AQE stage re-planning) runs unchanged
  * under a NON-DEFAULT manager class, asserted end-to-end by
  * ShuffleManagerSpec via a subprocess session (the manager is fixed
  * at SparkContext creation). */
class GraftShuffleManager(conf: SparkConf) extends SortShuffleManager(conf) {
  def this(conf: SparkConf, isDriver: Boolean) = this(conf)
}

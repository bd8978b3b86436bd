package org.apache.spark.graftprobe

import org.apache.spark.SparkEnv
import org.apache.spark.storage.BroadcastBlockId

/** Test-scope visibility bridge into the local BlockManager (the
  * relevant APIs are `private[spark]`): lets specs assert broadcast
  * lifecycle hygiene — that operators which broadcast corpus blocks
  * destroy them once their partials materialize, instead of leaving
  * them for an eventual GC (the r7 cross-query census-degradation
  * suspect). Local-mode only: driver and executor share one
  * BlockManager, so this sees every live broadcast block. */
object BroadcastProbe {

  /** Ids of broadcasts with at least one live local block. */
  def liveBroadcastIds(): Set[Long] =
    SparkEnv.get.blockManager.getMatchingBlockIds {
      case BroadcastBlockId(_, _) => true
      case _ => false
    }.collect { case BroadcastBlockId(id, _) => id }.toSet

  /** Total mem+disk bytes held by broadcast blocks whose broadcast id
    * is NOT in `exclude` — i.e. the footprint of broadcasts created
    * since an `exclude = liveBroadcastIds()` snapshot. */
  def liveBroadcastBytes(exclude: Set[Long] = Set.empty): Long = {
    val bm = SparkEnv.get.blockManager
    val ids = bm.getMatchingBlockIds {
      case BroadcastBlockId(id, _) => !exclude.contains(id)
      case _ => false
    }
    ids.flatMap(bm.getStatus(_)).map(s => s.memSize + s.diskSize).sum
  }
}

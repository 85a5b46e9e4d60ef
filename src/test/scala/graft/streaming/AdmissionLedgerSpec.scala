package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The admission ledger's recovery rule, pinned directly: a replay of
  * the recorded epoch reads the PRE state (no double-count), any other
  * epoch reads the POST state (no budget re-opens), an empty dir reads
  * empty. Sources round-trip through the encoding (tabs, spaces,
  * unicode) — a source slug must never corrupt the ledger format.
  */
class AdmissionLedgerSpec extends AnyFunSuite {

  test("recovery rule: empty → ∅; replayed epoch → pre; any other → post") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    assert(AdmissionLedger.recover(dir, 0L) == Map.empty)
    val pre = Map("src a" -> 1L, "s\tb" -> 4L)
    val post = Map("src a" -> 3L, "s\tb" -> 4L, "ünïc" -> 2L)
    AdmissionLedger.commit(dir, 5L, pre, post)
    assert(AdmissionLedger.recover(dir, 5L) == pre, "replay must see pre")
    assert(AdmissionLedger.recover(dir, 6L) == post, "next epoch sees post")
    assert(AdmissionLedger.recover(dir, 0L) == post,
      "a new incarnation (epoch numbering reset) continues the campaign")
    // a re-commit of the SAME epoch (retry after a failed checkpoint
    // commit) just replaces the entry — identical recovery after
    AdmissionLedger.commit(dir, 5L, pre, post)
    assert(AdmissionLedger.recover(dir, 6L) == post)
  }
}

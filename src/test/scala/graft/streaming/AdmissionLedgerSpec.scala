package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The admission ledger's recovery rule, pinned directly: a replay of
  * the recorded (incarnation, epoch) reads the PRE state (no
  * double-count), any other arrival reads the POST state (no budget
  * re-opens), an empty dir reads empty — including the previously
  * unobservable corner where a fresh-checkpoint restart arrives at
  * epoch 0 and the previous incarnation committed exactly one epoch
  * numbered 0 (the incarnation id disambiguates: continuation → post).
  * Sources round-trip through the encoding (tabs, spaces, unicode) — a
  * source slug must never corrupt the ledger format.
  */
class AdmissionLedgerSpec extends AnyFunSuite {

  test("recovery rule: empty → ∅; same-incarnation replayed epoch → pre; " +
      "any other → post") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    assert(AdmissionLedger.recover(dir, "run1", 0L) == Map.empty)
    val pre = Map("src a" -> 1L, "s\tb" -> 4L)
    val post = Map("src a" -> 3L, "s\tb" -> 4L, "ünïc" -> 2L)
    AdmissionLedger.commit(dir, "run1", 5L, pre, post)
    assert(AdmissionLedger.recover(dir, "run1", 5L) == pre,
      "same-run replay must see pre")
    assert(AdmissionLedger.recover(dir, "run1", 6L) == post,
      "next epoch sees post")
    assert(AdmissionLedger.recover(dir, "run2", 0L) == post,
      "a new incarnation (epoch numbering reset) continues the campaign")
    assert(AdmissionLedger.recover(dir, "run2", 5L) == post,
      "a different incarnation never replays another run's epoch")
    // a re-commit of the SAME epoch (retry after a failed checkpoint
    // commit) just replaces the entry — identical recovery after
    AdmissionLedger.commit(dir, "run1", 5L, pre, post)
    assert(AdmissionLedger.recover(dir, "run1", 6L) == post)
  }

  test("the epoch-0 collision: a fresh-checkpoint restart after a run that " +
      "committed exactly epoch 0 reads post, while a checkpoint-resume " +
      "replay of epoch 0 reads pre") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger0").toString
    val pre = Map.empty[String, Long]
    val post = Map("a" -> 7L)
    AdmissionLedger.commit(dir, "runA", 0L, pre, post)
    // checkpoint resume: the query id survives, so epoch 0 is a replay
    assert(AdmissionLedger.recover(dir, "runA", 0L) == pre)
    // fresh checkpoint: new query id — the spent budget stays closed
    assert(AdmissionLedger.recover(dir, "runB", 0L) == post,
      "a new incarnation at epoch 0 must not re-open the spent budget")
  }

  test("a legacy state file (no incarnation line) falls back to the " +
      "epoch-equality rule, so an in-flight campaign upgrades in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger_leg").toString
    val body = "epoch\t3\nP\ta\t1\nC\ta\t2"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "state.tsv"), body)
    assert(AdmissionLedger.recover(dir, "anyrun", 3L) == Map("a" -> 1L))
    assert(AdmissionLedger.recover(dir, "anyrun", 4L) == Map("a" -> 2L))
  }
}

package graft.learn

import scala.collection.mutable.ListBuffer

/**
 * `dedupe.console_label` (`convenience.py:122-199`) — the command-driven
 * labeling loop over an active-learning session, with the console replaced
 * by injectable IO so the SAME loop drives a terminal, a test transcript,
 * or any scripted front-end.
 *
 * Semantics ported exactly:
 *   - commands `y`(match) / `n`(distinct) / `u`(unsure) / `f`(finish) /
 *     `p`(previous); `p` is only offered (and only valid) when the
 *     one-deep undo buffer is non-empty (`convenience.py:168-176`);
 *     invalid input re-prompts without consuming a pair.
 *   - a labeled pair sits in a `buffer_len = 1` holding buffer before it
 *     is committed, so exactly the most recent decision can be undone;
 *     `p` pops it, decrements the shown counts, and re-queues the pair so
 *     it is re-shown next (`convenience.py:135,144-150,192-196`).
 *   - `u` commits the pair as BOTH match and distinct — the reference's
 *     resolution of dedupeio/dedupe#984 (`convenience.py:108-117`).
 *   - when the holding queue is exhausted the session asks the learner
 *     for fresh `uncertain_pairs`; an empty answer ends the loop the way
 *     the reference's `IndexError` does (`convenience.py:151-157`).
 *   - counts display as `{n}/10 positive, {m}/10 negative`, seeded from
 *     labels already on the session (`convenience.py:139-141,163`).
 *   - on finish, anything still in the holding buffer is committed
 *     (`convenience.py:198-199`).
 *
 * The one deliberate deviation: input exhaustion (EOF) acts as `f` —
 * the reference would raise `EOFError` out of `input()`, which no
 * scripted driver wants.
 *
 * @param input   one command per `next()` (a console `readLine`, a test
 *                script iterator)
 * @param display sink for the prompt lines the reference writes to stderr
 */
object ConsoleLabel {

  private final case class Held(idA: Long, idB: Long, label: String)

  /** Run the labeling loop; returns the number of committed label marks. */
  def run(learner: ActiveLearner, input: Iterator[String],
          display: String => Unit): Int = {
    var committed = 0
    def mark(h: Held): Unit = h.label match {
      case "unsure" => // both sides, per dedupeio/dedupe#984
        learner.markPair(h.idA, h.idB, 1)
        learner.markPair(h.idA, h.idB, 0)
        committed += 2
      case "match" => learner.markPair(h.idA, h.idB, 1); committed += 1
      case _ => learner.markPair(h.idA, h.idB, 0); committed += 1
    }

    val bufferLen = 1
    val unlabeled = ListBuffer.empty[(Long, Long)]
    val labeled = ListBuffer.empty[Held]
    var (nMatch, nDistinct) = learner.labeledCount
    var finished = false
    var usePrevious = false

    while (!finished) {
      var current: (Long, Long) = null
      if (usePrevious) {
        val h = labeled.remove(0)
        if (h.label == "match") nMatch -= 1
        else if (h.label == "distinct") nDistinct -= 1
        current = (h.idA, h.idB)
        usePrevious = false
      } else {
        if (unlabeled.isEmpty) unlabeled ++= learner.uncertainPairs()
        if (unlabeled.isEmpty) finished = true // reference: IndexError break
        else current = unlabeled.remove(unlabeled.size - 1)
      }

      if (!finished) {
        val values = learner.recordValues(Seq(current._1, current._2))
        Seq(current._1, current._2).foreach { rid =>
          display(s"f : ${values.getOrElse(rid, "")}")
          display("")
        }
        display(s"$nMatch/10 positive, $nDistinct/10 negative")
        display("Do these records refer to the same thing?")

        var response: Option[String] = None
        while (response.isEmpty) {
          val valid: Set[String] =
            if (labeled.nonEmpty) { display("(y)es / (n)o / (u)nsure / (f)inished / (p)revious"); Set("y", "n", "u", "f", "p") }
            else { display("(y)es / (n)o / (u)nsure / (f)inished"); Set("y", "n", "u", "f") }
          if (!input.hasNext) { display("Finished labeling"); response = Some("f") }
          else {
            val line = input.next()
            if (valid(line)) response = Some(line)
          }
        }

        response.get match {
          case "y" => labeled.insert(0, Held(current._1, current._2, "match")); nMatch += 1
          case "n" => labeled.insert(0, Held(current._1, current._2, "distinct")); nDistinct += 1
          case "u" => labeled.insert(0, Held(current._1, current._2, "unsure"))
          case "f" => display("Finished labeling"); finished = true
          case "p" => usePrevious = true; unlabeled += current
        }

        while (labeled.size > bufferLen) mark(labeled.remove(labeled.size - 1))
      }
    }

    labeled.foreach(mark)
    labeled.clear()
    committed
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Speed-layer twin of [[graft.ops.CorpusOps.packSequences]]: token-level
  * concat-and-chunk packing as documents ARRIVE — per-group state is ONE
  * Long (the group stream's running token offset), so each doc's packing
  * coordinates (tok_start / start_seq / end_seq / head_offset) are
  * assigned exactly once, in arrival order, without re-reading the
  * corpus. Within a micro-batch, docs sort by doc_id before folding so
  * at-least-once replays stay deterministic; across batches the offset
  * carries, so feeding the batch op's doc_id order through ANY batch
  * split yields bit-identical coordinates (StreamingSpec pins the
  * split-batch == batch parity). Zero-token docs are dropped, as in the
  * batch op.
  *
  * Scale: this is the ingestion-time shape of packing at 100 TB — the
  * batch op packs a bounded (source, shard) partition in one pass; the
  * stream twin EXTENDS the same stream as new data lands, with one long
  * of state per group key and no global re-pack. The same coordinate
  * algebra (integer division/modulo on the running offset) runs in both,
  * so a corpus packed half in batch and half in-stream is one consistent
  * sequence space.
  */
object StreamingPacker {

  final case class Doc(group: String, doc_id: Long, tokens: Long)
  final case class Offset(at: Long)
  final case class Packed(group: String, doc_id: Long, tokens: Long,
      tok_start: Long, start_seq: Long, end_seq: Long, head_offset: Long)

  def pack(docs: Dataset[Doc], budget: Int): Dataset[Packed] = {
    require(budget > 0, s"budget=$budget")
    implicit val outEnc = Encoders.product[Packed]
    implicit val stEnc = Encoders.product[Offset]
    val b = budget.toLong
    docs.groupByKey(_.group)(Encoders.STRING)
      .flatMapGroupsWithState[Offset, Packed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[Doc], gs: GroupState[Offset]) =>
          val sorted = it.toSeq.filter(_.tokens > 0).sortBy(_.doc_id)
          var at = gs.getOption.fold(0L)(_.at)
          val out = sorted.map { d =>
            val p = Packed(group, d.doc_id, d.tokens, at,
              at / b, (at + d.tokens - 1) / b, at % b)
            at += d.tokens
            p
          }
          gs.update(Offset(at))
          out.iterator
      }
  }
}

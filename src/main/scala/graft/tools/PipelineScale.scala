package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, CorpusPipeline, Dedup, Sampling, TextAnalysis}

/** End-to-end composed corpus-pipeline sweep (verdict r9 ask #8): the
  * product surface a real user runs is not one operator but the CHAIN
  * — exact-substring dedup → gates → exact dedup → LSH near-dup →
  * Gopher rule gate → temperature-scaled domain mix → BPE encode →
  * chunk → pack — as ONE composed Spark job, so cross-operator plan
  * effects (shuffle reuse, barrier placement, cache lifetimes) are
  * measured, not assumed. Each stage is the registry operator with
  * its registry parameters; the single action at the end is a pack
  * census (packs + rows + tokens), so every stage must actually
  * evaluate (no count()-prunable branches: the census aggregates
  * columns derived from every stage's output).
  *
  * Usage: runMain graft.tools.PipelineScale <dir1> [dir2 ...]
  * Prints one STAGE line per dir plus a final JSON line. */
object PipelineScale {
  def main(args: Array[String]): Unit = {
    val dirs = args.toSeq
    require(dirs.nonEmpty, "at least one data dir")
    val spark = graft.core.GraftSession.build("graft-pipeline-scale",
      graft.core.GraftSession.envCores)
    import graft.queries.PipelineQueries._
    val results = dirs.map { dir =>
      val t0 = System.nanoTime()
      val docs = graft.core.Tables.load(spark, dir, "documents")
      // stage 1-4: substring dedup + lang/len/quality gates + exact
      // dedup + verified LSH near-dup, composed inside clean()
      val survivors = CorpusPipeline.clean(docs, "doc_id", "text",
        CorpusPipeline.Config(CorpusLangs, CorpusMinWords, CorpusMinQuality,
          MinhashK, MinhashBands, Some(MinhashVerifyAgree),
          MinhashMaxBucket, substrWindow = Some(ExactSubstrW)))
      // clean() returns ids + metrics; text rejoins id-keyed for the
      // text stages (the broadcast/SMJ choice is AQE's)
      val kept = docs.join(survivors.select("doc_id"), Seq("doc_id"))
      // stage 5: Gopher rule gate (registry defaults; pure projection)
      val gated = TextAnalysis.gopherQualityFlags(kept, "doc_id", "text",
          minWords = 4, minStopHits = 0, minAlphaFrac = 0.0)
        .filter(col("keep")).select(col("doc_id"))
        .join(kept, Seq("doc_id"))
      // stage 6: temperature mix over the derived domain (q132 shape)
      val mixed = Sampling.mixByTemperature(
        gated.withColumn("domain",
          when(col("doc_id") % 10 < 6, "web")
            .when(col("doc_id") % 10 < 9, "code")
            .otherwise("books")),
        "doc_id", "domain", alpha = 0.5)
      // stage 7: BPE encode with a merge table trained on the mix
      val merges = Bpe.train(mixed, "text", merges = 8)
      val encoded = Bpe.encode(mixed, "doc_id", "text", merges)
        .select(col("doc_id"), col("n_tokens").as("bpe_tokens"))
      // stage 8-9: chunk to context windows, pack to token budgets
      val chunks = TextAnalysis.chunkByTokens(mixed, "doc_id", "text",
        maxTokens = 64, stride = 48)
      val packed = TextAnalysis.packSequences(chunks, "doc_id",
        "chunk_idx", "n_tokens", budget = 256, shards = 32)
        .join(encoded, Seq("doc_id"))
      val census = packed.agg(
        countDistinct(col("pack_shard"), col("pack_id")).as("n_packs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("total_tokens"),
        // summed per chunk row deliberately — the point is that the
        // census depends on the ENCODE stage's output, so no stage is
        // optimizer-prunable, not that the number means anything alone
        sum(col("bpe_tokens")).as("bpe_token_rows")).head
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $dir%-28s $wall%.2f s -> packs=${census.getLong(0)} " +
        f"chunks=${census.getLong(1)} tokens=${census.getLong(2)} " +
        f"bpeRows=${census.getLong(3)}")
      dir -> (wall, census.getLong(0), census.getLong(1), census.getLong(2))
    }
    println(results.map { case (d, (w, p, c, t)) =>
      s""""$d":{"wall":$w,"packs":$p,"chunks":$c,"tokens":$t}"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}

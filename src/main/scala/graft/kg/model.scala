package graft.kg

import java.sql.Timestamp

/** Core typed data model for the KG-construction engine.
  *
  * Shapes mandated by BASELINE.json:15 (input) and BASELINE.json:6
  * (output); see SURVEY.md §1.2. All case classes are Encoder-friendly
  * (product encoders) so the whole pipeline stays inside Catalyst —
  * no RDDs (BASELINE.json:15).
  */

/** INPUT — exact corpus row shape from BASELINE.json:15:
  * (repo, path, commit, lang, content).
  */
case class CodeFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Corpus row after ingest: per-row sha256 invariant column
  * (BASELINE.json:15 "content sha256 equality").
  */
case class HashedFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    file_sha: String)

/** Stage-1 output (mention detection, SURVEY T1).
  * Invariant: content.substring(start, end) == surface.
  * kind ∈ {import, def, class, base, call}.
  */
case class Mention(
    fileSha: String,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    surface: String,
    norm: String,
    kind: String,
    line: Int,
    start: Int,
    end: Int)

/** Stage-2 output (candidate pair generation, SURVEY J5/J6).
  * A candidate (subject-mention, object-mention) pair born colocated
  * per file — pair-gen is fused into the per-file scan, zero shuffle
  * (SURVEY §4.4(2)).
  */
case class CandidatePair(
    fileSha: String,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    subjNorm: String,
    subjKind: String,
    objNorm: String,
    objKind: String,
    lineDist: Int,
    nearest: Boolean)

/** Stage-3 output (relation classification, SURVEY T2). */
case class ScoredRelation(
    fileSha: String,
    repo: String,
    path: String,
    commit: String,
    subjNorm: String,
    pred: String,
    objNorm: String,
    score: Double)

/** Entity-dictionary row (broadcast lexicon, SURVEY S3).
  * One row per normalized alias; entityId is stable per canonical.
  */
case class DictEntry(
    norm: String,
    entityId: Long,
    canonical: String,
    kind: String)

/** Similarity-graph edge between two dictionary norms (SURVEY T6 input). */
case class AliasEdge(src: String, dst: String)

/** Connected-component result: every norm mapped to the canonical
  * representative of its alias cluster (SURVEY T6 output).
  */
case class CanonicalLink(norm: String, canonical: String)

/** OUTPUT — graph materialization (BASELINE.json:6,14): (subj, pred, obj)
  * triples, written partitioned by pred.
  */
case class Triple(
    subj: String,
    pred: String,
    obj: String,
    repo: String,
    path: String,
    commit: String,
    fileSha: String,
    score: Double)

/** Per-partition lineage manifest row (BASELINE.json:6 "per-partition
  * lineage and checkpointed resumability"). contentDigest is a
  * commutative xor-fold of xxhash64(file_sha) — invariant under
  * partitioning and row order, so N-core and 4N-core runs are directly
  * comparable.
  */
case class PartitionManifest(
    runId: String,
    stage: String,
    bucket: Int,
    rowCount: Long,
    contentDigest: Long,
    status: String,
    attempt: Int,
    startedAt: Timestamp,
    wallMs: Long)

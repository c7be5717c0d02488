"""TableGroup: multi-table consistent snapshots (catalog transactions).

The contract: a group version is a mutually-consistent pin set; torn
writes are invisible at the group level; pins survive member retention
until the group version itself is expired."""

from __future__ import annotations

import pytest

from mapreduceindexer_spark.sources.group import TableGroup
from mapreduceindexer_spark.sources.transact import (
    CommitConflict,
    TransactionalTable,
)


def _ids(df):
    return sorted(r[0] for r in df.select("id").collect())


@pytest.fixture()
def pair(spark, tmp_path):
    docs = TransactionalTable(str(tmp_path / "docs"))
    idx = TransactionalTable(str(tmp_path / "idx"))
    dv = docs.commit(spark.range(0, 6))
    iv = idx.commit(spark.range(100, 103))  # "index over v1 docs"
    grp = TableGroup(str(tmp_path / "grp"))
    g1 = grp.commit({"docs": (docs, dv), "idx": (idx, iv)})
    assert g1 == 1
    return docs, idx, grp


def test_group_reads_are_mutually_consistent(spark, pair):
    docs, idx, grp = pair
    # Direct writers advance BOTH members; the group still serves the
    # old, consistent pair until a new pin set is published.
    docs.commit(spark.range(6, 12), mode="append")
    idx.commit(spark.range(103, 109), mode="append")
    assert _ids(grp.read(spark, "docs")) == list(range(6))
    assert _ids(grp.read(spark, "idx")) == [100, 101, 102]
    g2 = grp.commit(
        {"docs": (docs, docs.current_version()),
         "idx": (idx, idx.current_version())}
    )
    assert _ids(grp.read(spark, "docs")) == list(range(12))
    # Old group version remains time-travelable and consistent.
    assert _ids(grp.read(spark, "docs", version=1)) == list(range(6))
    assert _ids(grp.read(spark, "idx", version=1)) == [100, 101, 102]
    assert grp.current_version() == g2


def test_torn_member_write_is_invisible_to_group_readers(spark, pair):
    docs, idx, grp = pair
    docs.commit(spark.range(6, 9), mode="append")  # member-only: no pin
    # The group head still resolves the old docs AND the matching idx.
    assert _ids(grp.read(spark, "docs")) == list(range(6))
    assert _ids(grp.read(spark, "idx")) == [100, 101, 102]


def test_group_cas_conflict_rolls_back_fresh_tags(spark, pair):
    docs, idx, grp = pair
    base = grp.current_version()
    dv = docs.commit(spark.range(6, 9), mode="append")
    g2 = grp.commit({"docs": (docs, dv)}, expected_version=base)
    with pytest.raises(CommitConflict):
        grp.commit({"docs": (docs, dv)}, expected_version=base)
    # The loser's tag for g2 was rolled back; the winner's stands.
    assert docs.tag_version(grp._tag_name("docs", g2)) == dv
    # And the loser left no stray g3 tag behind.
    with pytest.raises(ValueError):
        docs.tag_version(grp._tag_name("docs", g2 + 1))


def test_group_pins_survive_member_vacuum_until_expired(spark, pair):
    docs, idx, grp = pair
    docs.commit(spark.range(100, 101), mode="overwrite")
    grp.commit(
        {"docs": (docs, docs.current_version()),
         "idx": (idx, idx.current_version())}
    )
    docs.vacuum(keep_versions=1, grace_seconds=0.0)
    # Group v1 pinned docs v1: the pin tag kept it alive through vacuum.
    assert _ids(grp.read(spark, "docs", version=1)) == list(range(6))
    retired = grp.expire(keep_versions=1)
    assert retired == [1]
    docs.vacuum(keep_versions=1, grace_seconds=0.0)
    with pytest.raises(ValueError):
        grp.read(spark, "docs", version=1)  # manifest retired
    # The underlying table version is now reclaimable (tag released).
    with pytest.raises(Exception):
        docs.read(spark, 1).collect()


def test_group_guards(spark, tmp_path, pair):
    docs, idx, grp = pair
    with pytest.raises(ValueError, match="not pinned"):
        grp.read(spark, "nope")
    with pytest.raises(ValueError, match="invalid member name"):
        grp.commit({"bad name!": (docs, 1)})
    with pytest.raises(ValueError, match="does not exist"):
        grp.commit({"docs": (docs, 99)})
    # A failed commit leaves no half-created tags behind.
    with pytest.raises(ValueError):
        grp.commit({"docs": (docs, 1), "zz bad": (idx, 1)})
    with pytest.raises(ValueError):
        docs.tag_version(grp._tag_name("docs", grp.current_version() + 1))
    with pytest.raises(ValueError, match="invalid group name"):
        TableGroup(str(tmp_path / "g2"), name="bad name!")
    empty = TableGroup(str(tmp_path / "g3"))
    with pytest.raises(ValueError, match="no commits"):
        empty.pins()


def test_group_stream_replay_is_idempotent_and_consistent(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from mapreduceindexer_spark.streaming.group_sink import run_stream_to_group
    from mapreduceindexer_spark.streaming.index_stream import _write_doc_slices

    docs = spark.createDataFrame(
        [(i, f"alpha{i % 4} beta{i % 3} gamma") for i in range(30)],
        "doc_id: bigint, text: string",
    )
    stream_dir = str(tmp_path / "backlog")
    _write_doc_slices(docs, stream_dir, n_slices=3)
    dt = TransactionalTable(str(tmp_path / "docs"))
    it = TransactionalTable(str(tmp_path / "idx"))
    grp = TableGroup(str(tmp_path / "grp"))

    def drain(cp):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        run_stream_to_group(stream, dt, it, grp)

    drain("cp1")
    assert grp.current_version() == 3
    head_docs = grp.read(spark, "docs").count()
    head_terms = grp.read(spark, "idx").count()
    assert head_docs == 30
    # Every group version is index-consistent: the docs member's rows
    # equal the index member's document coverage at the SAME pin.
    for v in (1, 2, 3):
        dvc = grp.read(spark, "docs", version=v).count()
        cov = (
            grp.read(spark, "idx", version=v)
            .select(F.explode("doc_ids").alias("d"))
            .agg(F.count_distinct("d"))
            .collect()[0][0]
        )
        assert dvc == cov, (v, dvc, cov)
    # Full-backlog REPLAY (fresh checkpoint) no-ops at every layer.
    drain("cp2")
    assert grp.current_version() == 3
    assert grp.read(spark, "docs").count() == head_docs
    assert grp.read(spark, "idx").count() == head_terms


def test_group_commit_heals_orphan_pin_tags(spark, pair):
    # Simulate a committer that died between tagging and linking: the
    # orphan tag for the NEXT slot must not wedge every retry.
    docs, idx, grp = pair
    g_next = grp.current_version() + 1
    docs.tag(grp._tag_name("docs", g_next), 1)  # stale orphan (v1)
    dv = docs.commit(spark.range(6, 9), mode="append")
    g = grp.commit({"docs": (docs, dv)})
    assert g == g_next
    # The healed tag pins the COMMITTED version, not the orphan's.
    assert docs.tag_version(grp._tag_name("docs", g)) == dv


def test_loser_rollback_never_drops_published_pin(spark, pair):
    # r9-advice race: committer B heals A's not-yet-published slot-g
    # tag as an orphan and re-tags it; A then wins the manifest CAS
    # and its post-link re-verify runs BEFORE B's rollback — B's
    # unconditional drop would dangle the published pin. The rollback
    # must instead leave the tag, converged on the published version.
    import json
    import os

    docs, idx, grp = pair
    base = grp.current_version()
    vA = docs.commit(spark.range(6, 9), mode="append")
    vB = docs.commit(spark.range(9, 12), mode="append")
    g = base + 1
    tag = grp._tag_name("docs", g)
    docs.tag(tag, vB)  # B's orphan-heal re-tag, at B's own version
    # A wins the CAS: slot g publishes pinning docs@vA.
    man = {"version": g, "pins": {"docs": {"path": docs.path, "version": vA}}}
    with open(os.path.join(grp.manifest_dir, f"g{g}.json"), "w") as fh:
        json.dump(man, fh)
    # B's rollback: tag stays, converged on the PUBLISHED version.
    grp._release_tag(docs, "docs", tag, g)
    assert docs.tag_version(tag) == vA
    # Unpublished slot: rollback still drops the fresh tag as before.
    tag_next = grp._tag_name("docs", g + 1)
    docs.tag(tag_next, vB)
    grp._release_tag(docs, "docs", tag_next, g + 1)
    with pytest.raises(ValueError):
        docs.tag_version(tag_next)


def test_converge_guard_survives_vacuum_in_drop_retag_gap(spark, pair):
    """r10-advice race: _converge's drop_tag→tag(published) pair is not
    atomic — a member vacuum running in the gap sees the published
    version momentarily untagged and could reclaim it, after which the
    re-tag fails and (pre-fix) was silently swallowed, leaving the
    published group manifest dangling. The fix places a guard tag at
    the published version BEFORE the drop; this scripted interleave
    runs a real vacuum inside the gap and asserts the published
    version's data survives and the pin tag converges."""
    import json
    import os

    docs, idx, grp = pair
    base = grp.current_version()
    vA = docs.commit(spark.range(6, 9), mode="append")
    vB = docs.commit(spark.range(9, 12), mode="append")
    g = base + 1
    tag = grp._tag_name("docs", g)
    docs.tag(tag, vB)  # B's orphan-heal re-tag, at B's own version
    # A wins the CAS: slot g publishes pinning docs@vA.
    man = {"version": g, "pins": {"docs": {"path": docs.path, "version": vA}}}
    with open(os.path.join(grp.manifest_dir, f"g{g}.json"), "w") as fh:
        json.dump(man, fh)
    # Sink more commits so vA falls outside keep_versions=1 retention —
    # only a tag keeps it alive.
    for i in range(3):
        docs.commit(spark.range(100 + i), mode="append")
    real_drop = docs.drop_tag

    def drop_then_vacuum(name):
        real_drop(name)
        if name == tag:  # inside the gap: the adversarial vacuum
            docs.vacuum(keep_versions=1, grace_seconds=0.0)

    docs.drop_tag = drop_then_vacuum
    try:
        grp._release_tag(docs, "docs", tag, g)
    finally:
        docs.drop_tag = real_drop
    assert docs.tag_version(tag) == vA
    # The published pinned version is still fully readable (its data
    # dirs were never reclaimed) and no guard tag is left behind.
    assert grp.read(spark, "docs").count() == docs.read(spark, vA).count()
    import glob

    assert not glob.glob(os.path.join(docs.path, "_tags", "*__cvg_*.json"))


def test_stale_crash_orphan_guards_are_swept(spark, pair):
    """A healer SIGKILLed between taking its uuid guard and the
    finally-drop leaks a guard tag nobody would ever name again; the
    next converge must sweep it once it ages past the grace window
    (else that member version is pinned against vacuum forever — r11
    second review). A FRESH guard inside the window must survive."""
    import glob
    import json
    import os
    import time

    docs, idx, grp = pair
    base = grp.current_version()
    vA = docs.commit(spark.range(6, 9), mode="append")
    vB = docs.commit(spark.range(9, 12), mode="append")
    g = base + 1
    tag = grp._tag_name("docs", g)
    # The guard namespace is reserved: a user tag can neither be
    # created nor dropped there (so the sweeper can never unpin one).
    with pytest.raises(ValueError, match="reserved"):
        docs.tag(f"corpus__cvg_{g}", vA)
    with pytest.raises(ValueError, match="reserved"):
        docs.drop_tag(f"corpus__cvg_{g}")
    # Two orphans from "crashed healers" (internal entry point, as the
    # healer itself uses): one ancient, one fresh.
    docs._tag_unreserved(f"{tag[:40]}__cvg_deadbeef", vA)
    docs._tag_unreserved(f"{tag[:40]}__cvg_cafef00d", vA)
    old = os.path.join(docs.path, "_tags", f"{tag[:40]}__cvg_deadbeef.json")
    os.utime(old, (time.time() - 7200, time.time() - 7200))
    # An aged file whose CONTENT disagrees with its guard-shaped name
    # (hand-planted, not ours) must survive the sweep.
    alien = os.path.join(docs.path, "_tags", f"{tag[:38]}__cvg_0badf00d.json")
    with open(alien, "w", encoding="utf-8") as fh:
        json.dump({"name": "something-else", "version": vA}, fh)
    os.utime(alien, (time.time() - 7200, time.time() - 7200))
    # Trigger a converge (B's orphan-heal loses to a published slot g).
    docs.tag(tag, vB)
    man = {"version": g, "pins": {"docs": {"path": docs.path, "version": vA}}}
    with open(os.path.join(grp.manifest_dir, f"g{g}.json"), "w") as fh:
        json.dump(man, fh)
    grp._release_tag(docs, "docs", tag, g)
    assert docs.tag_version(tag) == vA
    left = {
        os.path.basename(f)
        for f in glob.glob(os.path.join(docs.path, "_tags", "*__cvg_*.json"))
    }
    assert f"{tag[:40]}__cvg_deadbeef.json" not in left  # aged out: swept
    assert f"{tag[:40]}__cvg_cafef00d.json" in left  # in-window: kept
    assert f"{tag[:38]}__cvg_0badf00d.json" in left  # alien content: kept


def test_guard_namespace_rejected_at_naming_time(spark, pair):
    """A group or member whose NAME contains '__cvg_' would build pin
    tags inside the reserved converge-guard namespace and fail deep in
    tagging on every commit — reject at naming time instead (r12
    review of the r11-advice reservation)."""
    docs, idx, grp = pair
    with pytest.raises(ValueError, match="reserved converge-guard"):
        TableGroup(grp.path, name="runs__cvg_a")
    v = docs.commit(spark.range(3), mode="append")
    with pytest.raises(ValueError, match="reserved converge-guard"):
        grp.commit({"m__cvg_x": (docs, v)})


def test_concurrent_group_committers_never_dangle(spark, pair):
    """The module invariant under REAL racing (not a scripted
    interleave): N threads retry-commit pin sets for successive slots;
    afterwards every published group version must hold a live member
    tag at exactly its pinned version — no orphan heal, CAS loss, or
    rollback ordering may ever leave a published manifest without its
    pin (the dangle the r10 _release_tag fix closes)."""
    import threading

    docs, idx, grp = pair
    vs = [
        docs.commit(spark.range(i * 10, (i + 1) * 10), mode="append")
        for i in range(1, 5)
    ]
    errs: list[Exception] = []

    def worker(v: int) -> None:
        try:
            for _ in range(20):
                try:
                    grp.commit({"docs": (docs, v)})
                    return
                except CommitConflict:
                    continue
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(v,)) for v in vs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    published = grp.versions()
    assert len(published) >= 1 + len(vs)  # g1 from the fixture + one per worker
    for g in published:
        pins = grp.pins(g)
        for member, pin in pins.items():
            table = TransactionalTable(pin["path"])
            tag = grp._tag_name(member, g)
            assert table.tag_version(tag) == pin["version"], (g, member)

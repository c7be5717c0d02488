"""Multi-table consistent snapshots: the catalog-level transaction.

A single ``TransactionalTable`` gives snapshot isolation per table; a
pipeline that maintains DERIVED tables (documents + their inverted
index, embeddings + their ANN index) needs the pair to move TOGETHER —
a reader must never see new documents against an old index. That is the
catalog-transaction gap every lakehouse hits (Iceberg solves it with an
external catalog such as Nessie; Delta doesn't solve it at all).

``TableGroup`` closes it with the same primitive the tables themselves
use: a hard-link CAS over immutable JSON manifests. Group version ``g``
pins ``{member name -> (table path, table version)}``. The write
protocol is write-then-publish:

1. commit to each member table normally (those versions are visible to
   DIRECT table readers immediately — the group adds consistency for
   GROUP readers, it does not hide single-table history);
2. ``commit(pins)`` — ONE manifest CAS publishes the new pin set
   atomically; a racing group committer loses the CAS and retries.

A writer dying between (1) and (2) leaves the group head unchanged:
group readers keep resolving the old, mutually-consistent pin set —
the torn write is invisible at the group level by construction.

Retention safety: each pin is materialized as an immutable TAG
(``grp_<group>_v<g>``) on the member table, so member ``vacuum`` keeps
pinned versions alive for as long as the group version exists —
``expire()`` retires old group manifests AND releases their tags in
one place. Pins-as-tags means a group snapshot can never dangle.

Reference has no table or catalog layer (src/functions.cpp:146-162);
this generalizes its single-output pipeline to the multi-artifact
shape a production indexer actually ships (corpus + index + stats).
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from mapreduceindexer_spark.ioutil import fsync_path
from mapreduceindexer_spark.sources.transact import (
    CommitConflict,
    TransactionalTable,
    _REF_NAME_RE,
)

_GROUP_NAME_RE = r"^[A-Za-z0-9_\-]{1,48}$"

# Converge-guard tags protect a published pin for the MILLISECONDS of a
# drop→re-tag gap; one older than this is a crash orphan (its healer
# died holding it) and may be swept by any later healer.
_GUARD_GRACE_SECONDS = 3600.0


# A guard file must match the exact shape _converge creates
# (<=40-char tag prefix + __cvg_ + 8 hex): anything else in the glob is
# NOT ours and must not be unlinked.
_GUARD_FILE_RE = re.compile(r"^[A-Za-z0-9_\-]{1,40}__cvg_[0-9a-f]{8}\.json$")


def _sweep_stale_guards(
    table: TransactionalTable, grace_seconds: float = _GUARD_GRACE_SECONDS
) -> None:
    """Drop crash-orphaned converge-guard tags (``*__cvg_*``) older than
    the grace window. Without this, a healer killed between taking its
    uuid-named guard and the finally-drop would pin that member version
    against vacuum FOREVER (r11 second review). Tag files are hardlinked
    once and never rewritten, so mtime is creation time; racing drops
    are tolerated.

    The guard namespace is reserved — public ``tag()`` rejects names
    containing ``__cvg_`` — so nothing here can delete a user tag. As
    defense in depth (pre-reservation legacy files, foreign writers),
    a candidate is unlinked only if its FILENAME matches the exact
    guard shape AND its JSON ``name`` field agrees with the filename
    (r11 advice)."""
    import glob
    import time

    for f in glob.glob(os.path.join(table.path, "_tags", "*__cvg_*.json")):
        base = os.path.basename(f)
        if not _GUARD_FILE_RE.match(base):
            continue
        try:
            if time.time() - os.path.getmtime(f) <= grace_seconds:
                continue
            with open(f, encoding="utf-8") as fh:
                if json.load(fh).get("name") != base[: -len(".json")]:
                    continue  # content disagrees: not a guard we wrote
            os.unlink(f)
        except (OSError, ValueError):
            pass  # a concurrent healer swept it first / unreadable


class TableGroup:
    """A versioned pin-set over member ``TransactionalTable``s rooted at
    ``path`` (its own directory; member tables live wherever they live).
    ``name`` prefixes the pin tags on member tables."""

    def __init__(self, path: str, name: str = "grp"):
        if not re.match(_GROUP_NAME_RE, name):
            raise ValueError(f"invalid group name {name!r}")
        if "__cvg_" in name:
            # Pin tags are built FROM the group name; a name containing
            # the converge-guard namespace would make every commit's
            # public tag() call hit the reservation deep inside tagging
            # (r12 review). Reject at naming time instead.
            raise ValueError(
                f"group name {name!r} uses the reserved converge-guard "
                "namespace ('__cvg_'); pick another name"
            )
        self.path = path
        self.name = name
        self.manifest_dir = os.path.join(path, "_group")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest plumbing (the TransactionalTable CAS, group-shaped) --

    def versions(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for n in os.listdir(self.manifest_dir):
            m = re.match(r"^g(\d+)\.json$", n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def _manifest(self, g: int) -> dict:
        p = os.path.join(self.manifest_dir, f"g{g}.json")
        try:
            with open(p, encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            raise ValueError(f"group version {g} does not exist") from None

    def pins(self, version: int | None = None) -> dict[str, dict]:
        """{name: {"path": ..., "version": ...}} of one group version."""
        g = self.current_version() if version is None else version
        if g == 0:
            raise ValueError("group has no commits")
        return self._manifest(g)["pins"]

    def _tag_name(self, member: str, g: int) -> str:
        return f"{self.name}_{member}_v{g}"

    def _release_tag(
        self, table: "TransactionalTable", member: str, tag: str, g: int
    ) -> None:
        """Rollback helper: release a slot-``g`` tag this committer
        created — UNLESS slot ``g`` has since been PUBLISHED pinning
        this member, in which case the tag now belongs to the group
        version and must be left in place (converged on the published
        version if a racer left it elsewhere).

        Without the publish check a losing committer could dangle the
        winner's pin: B heals A's not-yet-published tag as an orphan
        and re-tags it; A then wins the manifest CAS; B's rollback
        drop removes the tag AFTER A's post-link re-verify already
        ran — group version g ends published with no member tag, and
        member vacuum may reclaim the pinned version (r9 advice).

        Ordering matters BOTH sides of the drop: a manifest can link
        between a single pre-drop check and the drop (with the
        winner's re-verify completing in that gap), so the publish
        check is re-run AFTER the drop too, restoring the tag if slot
        g turned out published — check-after-drop pairs with the
        winner's verify-after-link; between them one of the two
        always runs last and heals (r10 review finding)."""

        def _published_pin() -> int | None:
            try:
                pin = self._manifest(g)["pins"].get(member)
                if pin is not None and pin.get("path") == table.path:
                    return pin.get("version")
            except ValueError:
                pass  # slot g not published (yet)
            return None

        def _converge(published: int) -> None:
            # Keep the tag, converging it on the published version
            # (idempotent with the winner's post-link re-verify —
            # both writers write the same value). The drop→re-tag pair
            # is NOT atomic, so a guard tag is placed at the published
            # version FIRST — without it, a concurrent member vacuum in
            # the gap could reclaim the published pinned version while
            # no tag protects it (r10 advice). The guard also makes the
            # final re-tag's failure diagnosable: if the tag cannot be
            # restored AND nobody else restored it, that is a dangling
            # published pin and must surface, not pass.
            try:
                if table.tag_version(tag) == published:
                    return
            except ValueError:
                pass  # tag missing entirely — restore it below
            # Guard name: per-healer UNIQUE (two healers sharing one
            # guard name would let the non-holder run its gap
            # unprotected after the holder's finally drops the shared
            # guard — r11 review finding) and capped well under
            # _REF_NAME_RE's 64 chars even for maximal base tags (a
            # too-long name would make tag() raise and silently
            # disable the guard — r11 review finding).
            # Crash-orphan cleanup (r11 second review): a healer
            # killed between tag(guard) and the finally-drop leaks a
            # uuid-named guard no one else would ever drop, pinning
            # that version against vacuum forever. Guards live for
            # MILLISECONDS, so any guard file older than the grace
            # window is a crash orphan — sweep them opportunistically
            # before taking our own.
            _sweep_stale_guards(table)
            # Guards live in a RESERVED tag namespace (public tag()
            # rejects '__cvg_' names), so they go through the internal
            # entry points.
            guard = f"{tag[:40]}__cvg_{uuid.uuid4().hex[:8]}"
            guard_held = False
            try:
                table._tag_unreserved(guard, published)
                guard_held = True
            except ValueError:
                # The published version is already gone — the final
                # re-tag check below surfaces it loudly.
                pass
            try:
                try:
                    table.drop_tag(tag)
                except ValueError:
                    pass  # already gone
                try:
                    table.tag(tag, published)
                except ValueError:
                    # Either a concurrent healer landed the identical
                    # tag (fine) or the published version no longer
                    # exists (the dangling-pin corruption this guard
                    # exists to prevent) — distinguish, never swallow.
                    try:
                        if table.tag_version(tag) != published:
                            raise ValueError("tag diverged")
                    except ValueError:
                        raise CommitConflict(
                            f"group {self.name!r}: published pin tag "
                            f"{tag!r} -> v{published} on {table.path} "
                            "could not be restored (version reclaimed?); "
                            "the published group manifest may dangle"
                        ) from None
            finally:
                if guard_held:
                    try:
                        table._drop_tag_unreserved(guard)
                    except ValueError:
                        pass
            # The guard is a fixed lease, not a renewed one: a healer
            # suspended past the grace window has its still-live guard
            # swept by a later healer, re-opening the vacuum race for
            # its drop->re-tag gap. Cheap hardening (r11 advice): after
            # the final re-tag, verify the published version still
            # EXISTS — a swept-guard race then surfaces as
            # CommitConflict instead of a silently dangling pin.
            if published not in table.versions():
                raise CommitConflict(
                    f"group {self.name!r}: published pin {tag!r} -> "
                    f"v{published} on {table.path} points at a reclaimed "
                    "version (guard lease expired mid-heal); the "
                    "published group manifest dangles"
                )

        published = _published_pin()
        if published is not None:
            _converge(published)
            return
        try:
            table.drop_tag(tag)
        except Exception:
            pass
        # Post-drop re-check: the manifest may have linked while we
        # were dropping — restore the published pin if so.
        published = _published_pin()
        if published is not None:
            _converge(published)

    def commit(
        self,
        pins: dict[str, tuple[TransactionalTable, int]],
        expected_version: int | None = None,
        meta: dict | None = None,
    ) -> int:
        """Atomically publish a new pin set; returns the group version.
        Each pinned member version is TAGGED on its table first (so
        member retention can never retire it while the group version
        lives); the group manifest CAS is the commit point — a lost
        race rolls the fresh tags back and raises ``CommitConflict``.

        ``pins`` = {member name: (table, version)}. Member names are
        ref-safe strings; tables must be main views (tags pin main
        lineage)."""
        base = (
            expected_version
            if expected_version is not None
            else self.current_version()
        )
        g = base + 1
        fresh_tags: list[tuple[TransactionalTable, str, str]] = []
        payload_pins: dict[str, dict] = {}
        try:
            for member, (table, v) in sorted(pins.items()):
                if not re.match(_REF_NAME_RE, member):
                    raise ValueError(f"invalid member name {member!r}")
                if "__cvg_" in member:
                    raise ValueError(
                        f"member name {member!r} uses the reserved "
                        "converge-guard namespace ('__cvg_'); pick "
                        "another name"
                    )
                tag = self._tag_name(member, g)
                try:
                    table.tag(tag, v)  # raises if v doesn't exist
                except ValueError as e:
                    if "already exists" not in str(e):
                        raise
                    if os.path.exists(
                        os.path.join(self.manifest_dir, f"g{g}.json")
                    ):
                        # The slot's manifest is published: the tag
                        # belongs to the winner. A concurrency loss.
                        raise CommitConflict(
                            f"group version {g} was published by another "
                            "committer; re-read the group and retry"
                        ) from None
                    # No manifest for slot g: the tag is an ORPHAN from
                    # a committer that died between tagging and linking
                    # (or a racer we will serialize with at the CAS).
                    # Without this healing, the slot would wedge: every
                    # retry re-raises on the stale tag forever.
                    # The heal itself RACES with other healers: the
                    # drop can find the tag already gone and the
                    # re-tag can find a racer's tag already landed —
                    # both are live-contention signals, not errors,
                    # and must surface as CommitConflict (the API's
                    # retry contract), never as a raw ValueError
                    # (found by the threaded-committer race test).
                    try:
                        table.drop_tag(tag)
                    except ValueError:
                        pass  # a racing healer dropped it first
                    try:
                        table.tag(tag, v)
                    except ValueError as e2:
                        if "already exists" not in str(e2):
                            raise
                        raise CommitConflict(
                            f"slot {g} tag contended by a concurrent "
                            "committer; re-read the group and retry"
                        ) from None
                fresh_tags.append((table, member, tag))
                payload_pins[member] = {"path": table.path, "version": v}
        except Exception:
            for table, member, tag in fresh_tags:
                try:
                    self._release_tag(table, member, tag, g)
                except Exception:
                    pass  # best-effort rollback: a failed release is
                    # an orphan the next committer's heal path clears;
                    # the ORIGINAL error must reach the caller
            raise
        payload = {"version": g, "pins": payload_pins}
        if meta:
            payload["meta"] = meta
        tmp = os.path.join(
            self.manifest_dir, f".tmp-{uuid.uuid4().hex[:12]}.json"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        final = os.path.join(self.manifest_dir, f"g{g}.json")
        try:
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            for table, member, tag in fresh_tags:
                try:
                    self._release_tag(table, member, tag, g)
                except Exception:
                    pass  # best-effort: see the rollback above
            raise CommitConflict(
                f"group version {g} was published by another committer; "
                "re-read the group and retry"
            ) from None
        os.unlink(tmp)
        fsync_path(self.manifest_dir)
        # Post-link re-verify: a racing committer may have treated one
        # of our fresh tags as an orphan (its manifest check ran before
        # our link landed) and dropped it. Tags are idempotent to
        # re-create at the same version, so heal any gap — the pin must
        # outlive us, not just win the race.
        for member, (table, v) in sorted(pins.items()):
            tag = self._tag_name(member, g)
            try:
                if table.tag_version(tag) != v:
                    table.drop_tag(tag)
                    table.tag(tag, v)
            except ValueError:
                try:
                    table.tag(tag, v)
                except ValueError:
                    pass  # lost a bench-race to an identical healer
        return g

    def read(
        self, spark: SparkSession, member: str, version: int | None = None
    ) -> DataFrame:
        """Read ``member`` AT THE GROUP-PINNED table version — the
        whole point: two ``read`` calls against the same group version
        are mutually consistent no matter what direct writers have
        done to the member tables since."""
        pins = self.pins(version)
        if member not in pins:
            raise ValueError(
                f"member {member!r} is not pinned by this group version "
                f"(pinned: {sorted(pins)})"
            )
        pin = pins[member]
        return TransactionalTable(pin["path"]).read(spark, pin["version"])

    def expire(self, keep_versions: int = 1) -> list[int]:
        """Retire group manifests older than the newest
        ``keep_versions`` and release their member tags — after which
        member ``vacuum`` may reclaim the underlying versions. Returns
        the retired group versions."""
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        vs = self.versions()
        retire = vs[:-keep_versions] if len(vs) > keep_versions else []
        for g in retire:
            m = self._manifest(g)
            for member, pin in m["pins"].items():
                try:
                    TransactionalTable(pin["path"]).drop_tag(
                        self._tag_name(member, g)
                    )
                except Exception:
                    pass  # tag already released / table gone
            os.unlink(os.path.join(self.manifest_dir, f"g{g}.json"))
        if retire:
            fsync_path(self.manifest_dir)
        return retire

"""Footprint-aware pin selection — the round-14 on-disk rung's lesson
turned into code.

A multi-consumer frame in a composed pipeline needs a "pin" so its
upstream executes once, not once per consumer.  The rung (SCALE.md
round 14, 1.68 GiB input) measured BOTH naive flavors failing at GB
inputs:

* **eager ``localCheckpoint`` everywhere** — its MEMORY_AND_DISK
  *deserialized* blocks serialize all tasks on the
  UnifiedMemoryManager unroll-reservation lock once a pinned frame
  stops fitting trivially (jstack'd convoy, >1 h, killed);
* **``DISK_ONLY`` persist everywhere** — streams in parallel (convoy
  gone) but materializes every frame, including PRE-reduction frames
  like the exact-substring shingle keys at ~40× corpus bytes (60 GiB
  on a 1.68 GiB input, killed at 84% disk).

The operators were right; pin *selection* was the scale-killer.  The
policy here encodes the rung's criterion:

* **post-reduction frames** (survivor manifests, pair tables, capped
  corpora — anything ≤ ~corpus-sized): pin, choosing the flavor by a
  plan-time size estimate — eager ``localCheckpoint`` for demonstrably
  small frames (its deserialized unroll is the fastest pin when the
  frame trivially fits), eager ``DISK_ONLY`` *serialized* persist
  above the threshold (out of executor memory, parallel write path,
  lineage KEPT so a lost executor recomputes instead of failing);
* **pre-reduction frames** (shingle keys, exploded positions —
  anything ∝ corpus tokens or bigger): NEVER pin; their producing
  projection is narrow, so each consumer recomputes it from the
  nearest *pinned post-reduction ancestor* — two map-side scans beat
  one 40×-input materialization at any scale.

The size estimate is Catalyst's ``optimizedPlan().stats()`` — free
(pure stat propagation, no execution), and self-correcting along a
pinned chain: cache substitution runs before the optimizer, so a frame
downstream of an already-materialized persist estimates from the REAL
cached size, not the propagated guess.  Unknown or failed estimates
pin to disk — the conservative direction (the convoy, not the disk
write, is the failure mode the estimate guards).

Disk pins register in :data:`operators.dedup._LAZY_PINS` so the
existing ``release_lazy_pins()`` call sites (plan audit, scale
harnesses) release them; within a query run they are also released by
Spark's ContextCleaner when the driver references drop.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

from .dedup import _LAZY_PINS

#: Flip threshold between eager localCheckpoint and DISK_ONLY persist,
#: from SCALE.md's measured criterion ("above ~100 MB of corpus text
#: per pinned frame, use disk").
SMALL_FRAME_BYTES = 100 << 20


def plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's size-in-bytes estimate of ``df``'s optimized plan, or
    ``None`` when the estimate is unavailable (Connect-style sessions
    without ``_jdf``, analysis errors).  Pure stat propagation — no
    job runs.  Estimates skew LARGE through joins (multiplicative
    propagation) and unknown-width strings, which is the safe skew for
    pin selection: an over-estimate costs a disk write, an
    under-estimate would re-create the unroll convoy."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def recompute_pin(df: DataFrame) -> DataFrame:
    """The explicit NO-pin: hand this as a ``pin=`` argument to mark a
    pre-reduction frame as recompute-from-lineage (each consumer
    re-runs the narrow producing projection from the nearest pinned
    ancestor).  Identity on purpose — the name documents the choice at
    the call site."""
    return df


class FootprintPin:
    """Per-site pin policy for composed pipelines: call :meth:`post`
    at post-reduction pin sites and pass :meth:`pre` (an alias of
    :func:`recompute_pin`) into operators that would otherwise pin
    pre-reduction frames.  Tracks its disk pins for :meth:`release`.

    ``small_bytes`` flips the post-reduction flavor; ``None`` disables
    the checkpoint fast path entirely (every post pin goes to disk —
    the paranoid setting for rungs where even "small" estimates are
    distrusted).

    ``lineage`` selects the large-frame flavor (round 16).  Default
    ``False``: eager ``localCheckpoint(storageLevel=DISK_ONLY)`` —
    the same streaming serialized disk-write path as the round-15
    persist (no MEMORY_AND_DISK unroll convoy), but the logical plan
    TRUNCATES at the pin.  With the lineage-kept persist, every
    consumer's plan nests the producer's full cached plan once per
    ``InMemoryTableScan`` reference (SparkPlanInfo.fromSparkPlan
    recurses into ``relation.cachedPlan`` per occurrence, no
    memoization), so plan-info node count multiplies down a pinned
    chain — measured 209 s build + 276 s collect of pure DRIVER CPU
    at sf0.001 in all-disk mode, a data-size-independent tax the
    composed pipeline paid again at the rung (guide §7.3: planning/
    render time as the bottleneck; §5 endorses localCheckpoint to cut
    lineage when the intermediate's fault tolerance is not critical).
    ``lineage=True`` restores the round-15 ``persist(DISK_ONLY)`` with
    lineage kept — a lost executor recomputes instead of failing the
    query — for deployments that want that trade; the rung A/Bs both.
    NOTE with ``lineage=False`` a released pin CANNOT recompute: the
    pipeline's release schedule must only drop frames whose every
    consumer has materialized (the stage-incremental drop accounting
    in queries_curation guarantees this ordering)."""

    def __init__(
        self,
        small_bytes: int | None = SMALL_FRAME_BYTES,
        lineage: bool = False,
    ):
        self.small_bytes = small_bytes
        self.lineage = lineage
        self.disk_pins: list[DataFrame] = []
        #: (site#, estimated bytes or None, flavor, label) — audit
        #: trail the scale harness prints so a rung run shows WHICH
        #: sites went to disk and what the estimator believed.
        self.decisions: list[tuple[int, int | None, str, str | None]] = []
        #: label -> post-materialization executed-plan string for
        #: labelled pin sites, captured only when ``capture_plans`` is
        #: set (tests assert operator shapes — e.g. the manifest's
        #: drop-accounting anti joins — that an eager pin removes from
        #: the FINAL executed plan; capturing here keeps them
        #: assertable).  Off by default: rung-scale plan strings are
        #: MBs each.
        self.capture_plans = False
        self.plans: dict[str, str] = {}
        #: id(frame) -> JVM RDD handle for ckpt_disk pins.
        #: ``DataFrame.unpersist`` is a CacheManager lookup, which a
        #: localCheckpoint'ed frame is NOT in — calling it is a silent
        #: no-op and the checkpoint blocks survive until JVM GC +
        #: ContextCleaner get around to them (measured: every block
        #: still live after release() at sf0.001).  Deterministic
        #: release needs the LogicalRDD's backing RDD unpersisted
        #: directly; analyzed() of the frame localCheckpoint returned
        #: IS that LogicalRDD.
        self._ckpt_rdds: dict[int, object] = {}

    def _capture(self, df: DataFrame, label: str | None) -> None:
        if label is None or not self.capture_plans:
            return
        try:
            self.plans[label] = (
                df._jdf.queryExecution().executedPlan().toString()
            )
        except Exception:  # noqa: BLE001 — capture is best-effort
            self.plans[label] = ""

    def post(self, df: DataFrame, label: str | None = None) -> DataFrame:
        """Pin a post-reduction frame: eager localCheckpoint when the
        plan-time estimate is demonstrably small, else eager DISK_ONLY
        serialized persist with lineage kept."""
        est = plan_size_estimate(df)
        if (
            self.small_bytes is not None
            and est is not None
            and est < self.small_bytes
        ):
            self.decisions.append(
                (len(self.decisions), est, "checkpoint", label)
            )
            out = df.localCheckpoint(eager=True)
            # capture AFTER the eager checkpoint: executing df's plan
            # finalizes its AQE tree, so the string shows the join
            # strategies that actually ran, not the pre-runtime guess
            self._capture(df, label)
            return out
        if self.lineage:
            self.decisions.append((len(self.decisions), est, "disk", label))
            out = df.persist(StorageLevel.DISK_ONLY)
            out.count()  # eager: every consumer reads the store
            self._capture(df, label)
            self.disk_pins.append(out)
            _LAZY_PINS.append(out)
            return out
        # default large-frame flavor: eager DISK_ONLY local checkpoint
        # — identical serialized streaming write, plan truncated at
        # the pin (see class docstring for the measured render tax)
        self.decisions.append((len(self.decisions), est, "ckpt_disk", label))
        out = df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        self._capture(df, label)
        self.disk_pins.append(out)
        try:
            self._ckpt_rdds[id(out)] = (
                out._jdf.queryExecution().analyzed().rdd()
            )
        except Exception:  # noqa: BLE001 — release degrades to the
            pass  # GC path; footprint accounting loses determinism only
        return out

    def _unpersist(self, df: DataFrame, blocking: bool) -> None:
        jr = self._ckpt_rdds.pop(id(df), None)
        if jr is not None:
            jr.unpersist(blocking)
        else:
            df.unpersist(blocking=blocking)

    def is_disk(self, df: DataFrame) -> bool:
        """True when ``df`` is one of this policy's LIVE disk pins
        (either flavor: lineage-kept persist or DISK_ONLY local
        checkpoint) — i.e. holding it costs real pinned footprint and
        an early release (with the matching eager drop-frame pin)
        pays.  False for small checkpoint-flavored pins and released
        frames, where stage-incremental accounting would only add
        eager jobs."""
        return any(p is df for p in self.disk_pins)

    #: Pre-reduction sites: never pin (see module docstring).
    pre = staticmethod(recompute_pin)

    def release(self) -> None:
        """Unpersist this policy's disk pins (blocking).  Under
        ``lineage=True`` this is safe while downstream results are
        still lazy (a post-release action recomputes); under the
        default ``ckpt_disk`` flavor the blocks are gone for good —
        call only after every consumer has materialized."""
        while self.disk_pins:
            df = self.disk_pins.pop()
            if df in _LAZY_PINS:
                _LAZY_PINS.remove(df)
            self._unpersist(df, blocking=True)

    def release_one(self, df: DataFrame) -> None:
        """Release a single disk pin EARLY — the caller asserts every
        consumer of ``df`` has already materialized, so holding its
        blocks only inflates the pipeline's peak pinned footprint.
        No-op for small checkpoint-flavored pins (nothing to
        unpersist) and for frames this policy never pinned, so call
        sites stay correct under any flavor mix.  Under
        ``lineage=True`` a consumer the caller missed recomputes
        instead of failing; under the default ``ckpt_disk`` flavor it
        would FAIL — the release schedule's consumers-first ordering
        is load-bearing and is what the rung + pin-mode equivalence
        tests prove."""
        for i, p in enumerate(self.disk_pins):
            if p is df:
                self.disk_pins.pop(i)
                if df in _LAZY_PINS:
                    _LAZY_PINS.remove(df)
                self._unpersist(df, blocking=False)
                return

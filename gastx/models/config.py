"""GastNet model configuration and per-layout static graph constants."""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import numpy as np

from gastx.skeleton import get_layout, local_adjacencies

# gab_impl values understood by the eval forward (gastx/ops/graph.py +
# the level-fusion routing in gastnet._forward). Inside gab_impl_levels,
# "" / "inherit" additionally mean "fall back to gab_impl".
VALID_GAB_IMPLS = ("xla", "auto", "pallas", "pallas_interpret",
                   "pallas_local", "pallas_local_interpret",
                   "pallas_level", "pallas_level_interpret",
                   "pallas_pbatch", "pallas_pbatch_interpret")


@dataclass(frozen=True)
class GastNetConfig:
    """Static configuration of a GastNet model (hashable; jit-static).

    Mirrors the constructor surface of the reference SpatioTemporalModel
    (model/gast_net.py:113-128). Shipped configs (reconstruction.py:220-228):
    27-frame = fw (3,3,3) ch 128; 81-frame = (3,3,3,3) ch 64;
    243-frame = (3,3,3,3,3) ch 32.
    """

    num_joints_in: int = 17
    in_features: int = 2
    num_joints_out: int = 17
    filter_widths: Tuple[int, ...] = (3, 3, 3)
    channels: int = 128
    dropout: float = 0.25
    causal: bool = False
    dense: bool = False
    layout: str = "h36m17"
    # Matmul/conv precision. TPU's DEFAULT multiplies fp32 operands at bf16
    # precision: measured max error 0.15mm vs the torch reference — outside
    # the 0.1mm parity budget. "high" (3-pass bf16) measures max 0.0013mm
    # (75x under budget) at +16% throughput over "highest" (6-pass), so it
    # is the parity default. Set "default" for the fastest mode, "highest"
    # for bit-level studies.
    matmul_precision: str = "high"
    # Per-op-class precision overrides: tuple of (op_class, precision) pairs
    # that beat matmul_precision for specific op classes. Op classes:
    # expand / temporal / mid1x1 / shrink / gab_cat / local_sem / local_off /
    # local_cat / attn_proj / attn_score / attn_apply / attn_cat. A class may
    # be level-qualified ("gab1.attn_proj", "lvl2.temporal"); the qualified
    # entry wins over the bare class.
    precision_overrides: Tuple[Tuple[str, str], ...] = ()
    # Attention / local-graph layout implementations (see gastx/ops/graph.py
    # docstrings). "batched" kills the 4-D small-lane (M, J, J, K) attention
    # tensor; "gather" avoids the channel-batched adjacency matmul.
    attn_impl: str = "einsum"
    local_impl: str = "einsum"
    # Row-tile VMEM budget for the fused GAB kernels: rows per tile =
    # budget // max(C, 128). Swept on-chip (perf_lab12): 4096 (32 rows at
    # C=128) = 14,441 seq/s; 5120 (40 rows) = 13,555 (non-8-multiple row
    # tiles relayout worse); 6144 (48 rows) compile-OOMs the 16M scoped
    # VMEM by 540K (stack 16.53M). 4096 is the measured optimum.
    gab_tile_budget: int = 4096
    # Fused-kernel compute form (gastx/ops/pallas/fused_gab.py): "v1" —
    # the r3-certified per-joint-FMA/per-head-dot bodies — "v2" — the
    # compute-restructured bodies (merged wide dots, roll-based local
    # aggregation, block-diagonal score projections; same math to
    # roundoff; measured slower, perf_lab18) — or "fold" (r5) — v1 local
    # branch + score-folded global branch: the theta/phi projections and
    # all 2K rank-1 score dots pre-contract into TWO thin (C, K) dots
    # (no nonlinearity sits between projection and score, so
    # (x@Wt_k+bt_k)@pt_k == x@(Wt_k@pt_k)+bt_k.pt_k exactly; the f32
    # contraction regroups -> roundoff-level divergence, needs its own
    # on-chip error cert; perf_lab40).
    gab_kernel_form: str = "v1"
    # Optional PER-LEVEL override of gab_kernel_form: one entry per level
    # ("" or "inherit" falls back to gab_kernel_form). Motivated by the r5
    # fold bisection (scripts/perf_lab36.py --form fold): fold WINS at the
    # frame-packed pbatch stages (243f gab0 K'=32: 157.5 vs 168.6 ms) but
    # LOSES at the K=8 per-GAB stages (gab2 205.4 vs 190.6, gab3 188.7 vs
    # 181.1 — the two thin small-lane score dots + 3-D lane slices relayout
    # worse than v1's per-head sliver dots at low head counts), so fold
    # ships per-level where measured faster.
    gab_kernel_form_levels: Tuple[str, ...] = ()
    # Heads per batched softmax chain inside the fused kernels (v1 form):
    # the per-head LeakyReLU/softmax/+C_k chains concat along the sublane
    # (query-joint) axis and run as ONE VPU chain per group — bitwise-
    # identical math (CI + on-chip verified 0.0 delta). perf_lab20
    # attributed 8.1 of gab0's 32.4 ms to the 8 per-head chains (per-op
    # dispatch on (TM,17,128)-padded slivers); the on-chip sweep
    # (perf_lab21) measured gab0 32.38/25.28/24.75/24.69 ms at group
    # 1/2/4/8 and the full 27f production forward 17,846 vs 14,418 seq/s
    # (+24%) at group 8 — the all-heads group is the default. Clamped to
    # num_heads per level.
    gab_softmax_group: int = 8
    # Replace each softmax group's G per-head apply dots with ONE blocked
    # (TM, G*J, J) @ (TM, J, G*g_ch) dot + diagonal-block extraction —
    # bitwise-identical per block (the per-head dots pad g_ch -> 128
    # lanes, so the blocked form's off-diagonal volume is already paid
    # as padding). MOSAIC-BLOCKED on this host's remote compile service
    # (perf_lab22: deterministic HTTP 500 in seconds, 3 attempts) —
    # interpret-verified opt-in for future Mosaic versions.
    gab_apply_block: bool = False
    # Replace the 2K rank-1 per-head score dots with TWO block-diagonal
    # (K*I, K) dots — the v2 form's dispatch win without its slower
    # roll-based local branch. Off-block weights are exact zeros (same
    # products) but the zero slots regroup the f32 accumulation tree, so
    # scores agree to 1-2 ulp, NOT bitwise (interpret CI allclose test).
    # MEASURED SLOWER on-chip (perf_lab24: 27f 17,430 vs 18,089 seq/s;
    # the 8x-wider contraction outweighs the saved sliver dispatches) —
    # stays opt-in, same lesson as gab_kernel_form="v2".
    gab_score_block: bool = False
    # Packed narrow-level layout (eval/dilated only, EXPERIMENTAL): levels
    # whose graph-block input width C is <= this threshold keep
    # activations as (B, T, J*C) — J in lanes — instead of (B, T, J, C),
    # cutting the 4x/2x lane padding of the 243f/81f ch-32/64 levels (the
    # measured bandwidth ceiling, perf_lab8). Convs become block-diagonal
    # matmuls and graph blocks run in the packed Pallas kernel
    # (fused_gab_packed, VMEM unpack). Interpret-verified == classic, but
    # BLOCKED ON REAL TPUs (r3): Mosaic rejects the kernel's lane->sublane
    # unpack ("infer-vector-layout: unsupported shape cast",
    # vector<TMxJ*C> -> vector<TM*JxC>), and every alternative
    # formulation re-hits the same relayout wall (DESIGN.md). 0 = off
    # (the default); bf16 storage_dtype is the adopted narrow-level
    # bandwidth lever instead.
    packed_channels: int = 0
    # EVAL-mode activation/param storage dtype: "float32" (default),
    # "bfloat16", or "auto" (= bf16 on TPU backends, f32 elsewhere).
    # bf16 storage halves HBM bytes — the roofline's binding term — and
    # was measured on-chip (r3, scripts/perf_lab8.py) per architecture:
    #   27f/ch128: 17.9k seq/s but 0.26mm worst seed — OVER the 0.1mm
    #              budget; stays f32 (the fused-kernel mixed path, 14.1k).
    #   81f/ch64:  4,317 vs 3,299 seq/s (+31%) at 0.087mm worst of 8 — the
    #              production default via config_for_frames ("auto").
    #   243f/ch32: 1,131 vs 894 seq/s (+26%) at 0.030mm — also default;
    #              removes the old B=256 HBM-capacity cap (B=1024 fits),
    #              leaving the ch-32 lane-padding bandwidth ceiling.
    # Training always runs f32 storage (the tier applies to eval only).
    storage_dtype: str = "float32"
    # HBM I/O dtype at the fused-kernel block boundaries: "float32"
    # (default) or "bfloat16". Under a pallas gab_impl the kernels upcast
    # on VMEM load and compute in f32 regardless, so "bfloat16" halves
    # only the block's HBM read/write bytes (plus the split form's HBM
    # intermediate) while the surrounding convs keep f32 storage +
    # "high" matmuls — a boundary-rounding-only precision cost, unlike
    # storage_dtype="bfloat16" which also turns every XLA matmul into a
    # bf16-operand product. No effect on the XLA path, training, or when
    # storage_dtype already made activations bf16.
    # MEASURED AND NOT ADOPTED (r3, scripts/perf_lab15.py, 27f B=1024):
    # 14,792 vs 14,104 seq/s (+4.9%) but 0.1597mm worst of 8 seeds —
    # over the 0.1mm budget at EVERY seed (0.13-0.16): rounding the
    # activations that cross the 6 block boundaries dominates, not
    # matmul precision (x itself is concatenated into the block output,
    # so boundary rounding perturbs it linearly). This also attributes
    # 27f's full-bf16-storage error (0.26mm): mostly activation
    # rounding, unfixable by precision tiers. Kept as an opt-in for
    # >0.1mm-budget deployments.
    gab_io_dtype: str = "float32"
    # Optional PER-LEVEL override of storage_dtype for the eval forward:
    # one entry per level ("" or "inherit" falls back to storage_dtype;
    # "float32"/"bfloat16" pin that level's activations + params). The r4
    # 81f margin work (VERDICT r3 item 3): all-bf16 storage shipped
    # 0.0935mm worst of 24 seeds on a 0.1mm budget. The per-level error
    # ablation (scripts/perf_lab32.py) found NO single tail-owning level —
    # restoring f32 at ANY one level cuts worst-of-8 to ~0.0747mm (the
    # boundary-rounding error is distributed evenly) — so the cheapest
    # level wins: f32 at the C=512 tail level (tiny T=3 activations)
    # measures 4,714 vs 4,725 seq/s (-0.2%) and 0.0747mm worst of 24.
    # ADOPTED as the 81f production default via config_for_frames.
    # Levels cast at entry (activations astype + params/state
    # cast_floating); the final shrink runs at the last level's dtype.
    storage_dtype_levels: Tuple[str, ...] = ()
    # Graph-attention-block implementation for the EVAL-mode forward:
    # "xla" (default for bare configs), "pallas" — the fused VMEM-resident
    # kernels (gastx/ops/pallas/fused_gab.py): whole-block kernel for
    # C <= 256, the two-kernel split form for C <= 512 (the widest level
    # of every shipped config) — "pallas_level" — additionally fuses the
    # WHOLE level (dilated conv -> BN -> ReLU -> 1x1 -> BN -> ReLU ->
    # +residual -> GAB) into one kernel per batch element where the GAB
    # weights fit VMEM and the sequence is short enough
    # (gastx/ops/pallas/fused_level.py; longer sequences fall back
    # per-level to the per-GAB kernels) — or "auto" (= "pallas" on TPU
    # backends, "xla" elsewhere; the config_for_frames inference
    # default). Measured on-chip r3c under the certified preset: "pallas"
    # +14% end-to-end (14,074 vs 12,299 seq/s at B=1024/27f) at 0.0631mm
    # worst of 24 seeds vs all-"highest"; "pallas_level" 14,418 seq/s at
    # 0.0511mm worst of 8 (scripts/perf_lab16.py) — strictly faster AND
    # tighter (the conv chain's kernel dots replace the XLA "high" convs).
    # Training steps always take the XLA path.
    gab_impl: str = "xla"
    # Optional PER-LEVEL override of gab_impl for the eval forward: one
    # entry per level ("" or "inherit" falls back to gab_impl). Motivated
    # by the r3 narrow-arch attribution (scripts/perf_lab26/27.py): per
    # GAB stage at 243f/B=512 the bf16-XLA route wins at C=32 (99.7 vs
    # 108.5 ms) and ties at C=64, while the f32-compute fused kernels win
    # at C=128 (101.1 vs 114.4) and C=256 (97.0 vs 121.9) — so a hybrid
    # route runs each level at its measured-fastest impl
    # (scripts/perf_lab28.py measures the end-to-end combinations).
    gab_impl_levels: Tuple[str, ...] = ()
    # Cap on the batch-pack factor of the "pallas_pbatch" impl (P =
    # min(128 // C, cap); 0 = uncapped). The r4 bisect: pack=4 at C=32
    # (16 effective heads) overflows scoped VMEM at the default row tile
    # — fused_gab_pbatch auto-scales its tile budget by 8/K' beyond 8
    # effective heads, so this cap is a tuning knob (pack=2 keeps the
    # classic TM=32 tiles at half the lane utilization).
    gab_pbatch_max_pack: int = 0

    def gab_impl_for(self, i: int) -> str:
        """gab_impl for level ``i``: the per-level override when set."""
        if i < len(self.gab_impl_levels):
            v = self.gab_impl_levels[i]
            if v and v != "inherit":
                return v
        return self.gab_impl

    def gab_form_for(self, i: int) -> str:
        """gab_kernel_form for level ``i``: the per-level override when
        set."""
        if i < len(self.gab_kernel_form_levels):
            v = self.gab_kernel_form_levels[i]
            if v and v != "inherit":
                return v
        return self.gab_kernel_form

    def storage_dtype_for(self, i: int, resolved: str) -> str:
        """Storage dtype for level ``i``: the per-level override when set,
        else ``resolved`` (the caller's already-"auto"-resolved
        storage_dtype)."""
        if i < len(self.storage_dtype_levels):
            v = self.storage_dtype_levels[i]
            if v and v != "inherit":
                return v
        return resolved

    def precision_for(self, op_class: str):
        """Override precision for an op class, or None to inherit the
        jax.default_matmul_precision context (= matmul_precision)."""
        for name, prec in self.precision_overrides:
            if name == op_class:
                return prec
        return None

    def __post_init__(self):
        for fw in self.filter_widths:
            if fw % 2 == 0:
                raise ValueError("Only odd filter widths are supported")
        if get_layout(self.layout).num_joints != self.num_joints_in:
            raise ValueError(
                f"layout {self.layout} has "
                f"{get_layout(self.layout).num_joints} joints, expected "
                f"{self.num_joints_in}")
        if self.gab_impl not in VALID_GAB_IMPLS:
            raise ValueError(
                f"unknown gab_impl {self.gab_impl!r}; valid: "
                f"{VALID_GAB_IMPLS}")
        if len(self.gab_impl_levels) > self.num_levels:
            raise ValueError(
                f"gab_impl_levels has {len(self.gab_impl_levels)} entries "
                f"for a {self.num_levels}-level architecture")
        for v in self.gab_impl_levels:
            if v not in VALID_GAB_IMPLS + ("", "inherit"):
                raise ValueError(
                    f"unknown gab_impl_levels entry {v!r}; valid: "
                    f"{VALID_GAB_IMPLS + ('', 'inherit')}")
        if len(self.gab_kernel_form_levels) > self.num_levels:
            raise ValueError(
                f"gab_kernel_form_levels has "
                f"{len(self.gab_kernel_form_levels)} entries for a "
                f"{self.num_levels}-level architecture")
        for v in self.gab_kernel_form_levels:
            if v not in ("", "inherit", "v1", "v2", "fold"):
                raise ValueError(
                    f"unknown gab_kernel_form_levels entry {v!r}; valid: "
                    f"('', 'inherit', 'v1', 'v2', 'fold')")
        if len(self.storage_dtype_levels) > self.num_levels:
            raise ValueError(
                f"storage_dtype_levels has {len(self.storage_dtype_levels)}"
                f" entries for a {self.num_levels}-level architecture")
        for v in self.storage_dtype_levels:
            if v not in ("", "inherit", "float32", "bfloat16"):
                raise ValueError(
                    f"unknown storage_dtype_levels entry {v!r}; valid: "
                    f"('', 'inherit', 'float32', 'bfloat16')")
        if self.packed_channels and any(
                v not in ("", "inherit") for v in self.storage_dtype_levels):
            raise ValueError(
                "storage_dtype_levels is not supported with packed_channels")
        if self.packed_channels and any(
                v not in ("", "inherit") for v in self.gab_impl_levels):
            # The packed narrow-level prefix routes solely off gab_impl
            # (it has no per-level kernel alternatives), so per-level
            # overrides would be silently ignored there.
            raise ValueError(
                "gab_impl_levels is not supported with packed_channels")

    # --- derived geometry (model/gast_net.py:57,139-153) ---

    def pads(self) -> Tuple[int, ...]:
        pads = [self.filter_widths[0] // 2]
        next_dilation = self.filter_widths[0]
        for fw in self.filter_widths[1:]:
            pads.append((fw - 1) * next_dilation // 2)
            next_dilation *= fw
        return tuple(pads)

    def causal_shifts(self, variant: str = "dilated") -> Tuple[int, ...]:
        """Per-level asymmetric shifts used for residual slicing.

        The dilated variant scales shifts by the running dilation
        (model/gast_net.py:139-143); the strided variant works in the
        already-downsampled time axis so shifts stay unscaled
        (model/gast_net.py:216-220).
        """
        if not self.causal:
            return tuple(0 for _ in self.filter_widths)
        shifts = [self.filter_widths[0] // 2]
        next_dilation = self.filter_widths[0]
        for fw in self.filter_widths[1:]:
            if variant == "strided":
                shifts.append(fw // 2)
            else:
                shifts.append(fw // 2 * next_dilation)
            next_dilation *= fw
        return tuple(shifts)

    def receptive_field(self) -> int:
        """Total receptive field in frames (model/gast_net.py:62-69)."""
        return 1 + 2 * sum(self.pads())

    def total_causal_shift(self) -> int:
        """Asymmetric padding offset for causal streaming: half the receptive
        field when causal, else 0."""
        return sum(self.pads()) if self.causal else 0

    @property
    def num_levels(self) -> int:
        return len(self.filter_widths)

    def block_channels(self, i: int) -> int:
        """Channel count entering graph-attention block ``i`` (doubles per
        block: 2^i * channels)."""
        return (2**i) * self.channels

    @property
    def out_channels(self) -> int:
        return (2 ** self.num_levels) * self.channels


# Measured per-op-class mixed-precision presets (v5e, B=1024, 27f/17j,
# scripts/perf_lab{2,3,13}.py; 2026-08-16/17). Errors are max |delta| vs
# the matmul_precision="highest" forward over random weight/input draws;
# the parity budget is 0.1 mm end-to-end.
#
#   preset              seq/s   max err             note
#   all "high"          10643   0.0013 mm           training / bit-studies
#   TPU_MIXED (below)   18098   0.0577 mm (24 seed) inference default (level-fused kernels + softmax_group=8 + high_rhs convs; 14418 before the r3 batched-softmax/2-pass adoptions)
#   + attn_cat default  14441   0.1088 mm (24 seed) REJECTED r3: tail over budget
#   + attn_proj default 14002   0.124 mm  (8 seed)  REJECTED: over budget
#   all "default"       15642   0.16 mm   (8 seed)  REJECTED: over budget
#
# r3 tail re-certification (scripts/perf_lab13.py): the original 6-op
# preset (incl. attn_cat) measured 0.093 mm worst of 8 seeds but 0.1088 mm
# at 24 seeds (seed 17; the XLA path shows the same 0.1065 mm tail, so the
# preset — not the kernels — carried it). A canary sweep over single-op
# promotions found attn_cat->"high" the decisive fix (worst-2-seeds
# 0.1088 -> 0.0463 mm) at -2.5% throughput; re-certified 0.0631 mm worst
# of 24 seeds through the production fused-kernel path. attn_cat's 3C->2C
# contraction is the widest "default"-tier dot in the block (3C=384 at
# ch128), which is why it owns the tail.
#
# The ceiling is structural: x_convs / x_gabcat / each gab level at
# "default" individually measure 0.11-0.20 mm (perf_lab2), so no
# precision-mixing config faster than this can stay within the budget —
# further speed must come from layout/kernel work, not precision.
#
# The preset also holds on the deeper shipped architectures (measured
# on-chip, scripts/perf_lab6.py with the pre-r3 6-op preset, worst of 4
# seeds vs all-"highest"): 81f/ch64 0.023 mm, 243f/ch32 0.011 mm —
# shallower channel widths shorten the bf16 dot accumulations, so the
# 27f/ch128 figure is the binding one (promoting attn_cat only tightens
# these).
#
# r3 kernel-side refinement (scripts/perf_lab19.py): the conv-chain ops
# run at "high_rhs" — the 2-pass KERNEL-ONLY compensated tier (weights
# exact, activations bf16-rounded; see KERNEL_ONLY_TIERS below). Inside
# the level-fused kernels this cuts one MXU pass per conv dot; on XLA
# matmul sites it resolves to "high", so the XLA path is bitwise
# unchanged. Measured on-chip stacked on gab_softmax_group=8: 18,098 vs
# 17,846 seq/s (+1.4%) at 0.0577 mm worst of 24 seeds ("high_lhs":
# 18,034 at 0.0603 — high_rhs wins both).
TPU_MIXED_PRECISION_OVERRIDES: Tuple[Tuple[str, str], ...] = (
    ("local_sem", "default"), ("local_off", "default"),
    ("local_cat", "default"), ("attn_score", "default"),
    ("attn_apply", "default"),
    ("temporal", "high_rhs"), ("mid1x1", "high_rhs"),
)
# Historical name: the r2 "conservative" preset. Since the r3 24-seed
# re-certification promoted attn_cat to "high", the production preset IS
# the safe preset — kept as an alias for API compatibility.
TPU_MIXED_SAFE_OVERRIDES: Tuple[Tuple[str, str], ...] = \
    TPU_MIXED_PRECISION_OVERRIDES

# Tiers that exist only inside the Pallas kernels
# (gastx/ops/pallas/precision.py): the 2-pass error-compensated pair —
# "high_lhs" keeps the activations exact and rounds the weights to bf16,
# "high_rhs" the reverse — and "kdefault", a kernel-only 1-pass bf16 dot.
# XLA has no matching Precision enum (and "kdefault"'s point is to leave
# XLA sites alone), so model resolvers map all three to "high" on XLA
# paths (gastnet._forward) — valid in precision_overrides, NOT as the
# base matmul_precision.
KERNEL_ONLY_TIERS: Tuple[str, ...] = ("high_lhs", "high_rhs", "kdefault")


def xla_precision(tier):
    """The XLA-side tier for a possibly kernel-only precision tier."""
    return "high" if tier in KERNEL_ONLY_TIERS else tier


class GraphStatics(NamedTuple):
    """Static per-layout constants consumed by the graph ops."""

    num_joints: int
    sym_idx: np.ndarray  # flat row-major nonzero indices of adj_sym
    con_idx: np.ndarray  # flat row-major nonzero indices of adj_con


@functools.lru_cache(maxsize=None)
def graph_statics(layout_name: str) -> GraphStatics:
    layout = get_layout(layout_name)
    adj_sym, adj_con = local_adjacencies(layout)
    return GraphStatics(
        num_joints=layout.num_joints,
        sym_idx=np.flatnonzero(adj_sym > 0),
        con_idx=np.flatnonzero(adj_con > 0),
    )


def config_for_frames(
    frames: int, num_joints: int = 17, *, causal: bool = False,
    dropout: float = 0.05,
    precision_overrides: Tuple[Tuple[str, str], ...] =
        TPU_MIXED_PRECISION_OVERRIDES,
    gab_impl: str = "auto",
) -> GastNetConfig:
    """The shipped receptive-field -> architecture table
    (reconstruction.py:220-228, gen_skes.py:43-97).

    This is the *inference* entry point (reconstruct/realtime/gen_skes
    CLIs), so it defaults to the measured mixed-precision preset
    (max 0.0632 mm over 24 seeds — see TPU_MIXED_PRECISION_OVERRIDES) and,
    on TPU backends, the fused graph-attention-block kernels
    (``gab_impl="auto"`` = level-fused kernels incl. the fused level-0
    expand prefix on f32 paths — 20,127 seq/s at B=1024/27f,
    scripts/perf_lab30.py — and frame-packed pbatch kernels at C<128 +
    per-GAB kernels at C>=128 on bf16-storage paths — 4,775/1,361 seq/s
    at 81f/243f, scripts/perf_lab29.py + the 243f 1-pass tier loosening
    below, scripts/perf_lab35.py). Pass
    ``precision_overrides=()`` + ``gab_impl="xla"`` for the all-"high"
    bit-study mode; training builds GastNetConfig directly and stays
    all-"high"/XLA.
    """
    if frames == 27:
        fw, ch = (3, 3, 3), 128
    elif frames == 81:
        fw, ch = (3, 3, 3, 3), 64
    elif frames == 243:
        fw, ch = (3, 3, 3, 3, 3), 32
    else:
        raise ValueError(f"No shipped config for receptive field {frames}")
    layout = {17: "h36m17", 19: "h36m19", 16: "sh16", 15: "humaneva15"}[num_joints]
    # 81f/243f inference defaults to bf16 activation/param storage on TPU
    # ("auto"): measured within-budget (0.090/0.034 mm worst of 8 seeds)
    # at +31%/+26% — the narrow-channel architectures' short accumulations
    # keep bf16 error small where 27f/ch128's does not (0.26 mm). See the
    # storage_dtype field's measured table. 81f additionally restores f32
    # at the C=512 tail level (storage_dtype_levels, r4 perf_lab32):
    # worst-of-24 error 0.0935 -> 0.0747 mm for -0.2% speed — the margin
    # restoration VERDICT r3 item 3 asked for. ("float32" entries are
    # no-ops when "auto" resolves to f32 off-TPU, so the override is
    # backend-safe.)
    storage = "auto" if frames in (81, 243) else "float32"
    storage_levels = ("", "", "", "float32") if frames == 81 else ()
    overrides = tuple(precision_overrides)
    # 243f tier loosening (r4 perf_lab35): on the kernel route the three
    # remaining in-kernel "high" (3-pass) dot classes drop to 1-pass —
    # 1,259 -> 1,361 seq/s (+8.1%) at 0.0321 mm worst of 24 seeds (base
    # 0.0261) — the narrow-channel accumulations keep 1-pass error tiny.
    # "kdefault" is the KERNEL-ONLY 1-pass tier: it resolves where the
    # route resolves — only dots that actually execute inside the Pallas
    # kernels run 1-pass; every XLA matmul site (train=True forwards,
    # non-TPU backends where "auto" falls back to XLA, explicit-impl
    # sub-paths) maps it to "high", bitwise the pre-loosening certified
    # behavior (r5 advisor fix; the r4 form used plain "default", which
    # leaked real 1-pass bf16 into the XLA fallbacks). Applied only to
    # the default preset on the default "auto" route so explicit
    # gab_impl/preset choices keep their own measured error tables. The
    # 24-seed cert (h36m17, non-causal) covers the shipped kernel route;
    # causal/other-layout 243f configs inherit it on the project-wide
    # convention that certs are taken at h36m17 (their kernels run the
    # same dot shapes).
    form_levels: Tuple[str, ...] = ()
    if (frames == 243 and gab_impl == "auto"
            and overrides == TPU_MIXED_PRECISION_OVERRIDES):
        overrides = (("attn_proj", "kdefault"), ("attn_cat", "kdefault"),
                     ("gab_cat", "kdefault")) + overrides
        # r5 fold adoption (perf_lab36 --form fold bisection + perf_lab38
        # fold0 A/B): the score-FOLDED global branch at the gab0 pbatch
        # stage only (K'=32 is the one head count where the two thin
        # folded score dots beat v1's per-head slivers; gab1 K'=16
        # Mosaic-500s/loses, gab2/3 K=8 lose — DESIGN.md r5 table).
        # End-to-end 1,361 -> 1,381 seq/s (+1.5%) at 0.0329 mm worst of
        # 24 seeds (base 0.0321). Same gate as the tier loosening: the
        # default preset on the default "auto" route; the form is only
        # read by the Pallas kernel entry points, so XLA fallbacks and
        # training are bitwise unaffected.
        form_levels = ("fold",)
    return GastNetConfig(num_joints_in=num_joints, num_joints_out=num_joints,
                         filter_widths=fw, channels=ch, causal=causal,
                         dropout=dropout, layout=layout,
                         precision_overrides=overrides,
                         gab_impl=gab_impl, storage_dtype=storage,
                         storage_dtype_levels=storage_levels,
                         gab_kernel_form_levels=form_levels)

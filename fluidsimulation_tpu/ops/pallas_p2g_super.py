"""Pallas TPU kernel: P2G transfer over VMEM-resident SUPERCELL-table tiles.

Same role as ops/pallas_p2g.py but for the (2,2,1) supercell table
(ops/supertable.py): tiles the pre-padded (sx+2, sy+2, Ks, sz+2) fields with
overlapping ``pl.Element`` halo blocks, and accumulates the reference's
{-1,0} x {-1,0,1}^2 cell windows (gpTransferParticleVelocitiesU.hlsl:36-59)
for all three components and all four (x, y) cell parities from VMEM.

Window bookkeeping (see supertable.p2g_from_super): per parity the pooled
x/y axes need only 2 supercell offsets, z keeps exact cell offsets, and
membership masks (on floor(p+0.5) of the stored position) restrict slots to
exactly the reference window — per output cell that is 2*2*3 supercells *
Ks = 96 slot visits vs the per-cell kernel's 27 * K.

Outputs are parity-packed cell-indexed accumulators (4, sx, sy, nz)
(acc[a][c] = unnormalized face value at staggered index c+1, amt = weight
sum); the cheap parity interleave, normalization, boundary faces, validity,
and overflow correction stay in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SimConfig
from .supertable import F


def _batched_default() -> tuple[bool, int]:
    """Step-level A/B toggle for the batched kernel form (same pattern as
    FST_NO_PALLAS): unset -> the measured-best default; FST_P2G_BATCHED
    forces a form within one process so the A/B is same-machine-state:
    0 = unbatched, 1/16 = batched full, 8/4 = batched chunked."""
    import os

    v = os.environ.get("FST_P2G_BATCHED", "")
    if v == "0":
        return False, 16
    if v in ("1", "16"):
        return True, 16
    if v in ("8", "4"):
        return True, int(v)
    return False, 16


_ZBLOCK = 128  # lane-dim block width when z-blocking (must be % 128)


def super_p2g_fits(cfg: SimConfig, ks: int | None = None) -> bool:
    """Empirical Mosaic budget for the super-P2G kernel.  The 21 preshifted
    (tx+2, ty+2, Ks, nz) Element halo blocks plus the kernel's per-combo
    accumulator temps compile (and run, TPU-gated tests) at the flagship
    Ks*nz = 8*128; past that the remote Mosaic compile helper crashes
    deterministically (subprocess exit 1, scripts/diag_kernels_256.py), so
    the kernel Z-BLOCKS instead (round 5): the z windows arrive as three
    pre-shifted aligned inputs, so 128-lane z blocks need no halo and the
    live set stays at the flagship size at any nz % 128 == 0.  Grids that
    neither fit unblocked nor divide into 128-lane z blocks run the XLA
    supercell form (supertable.p2g_from_super) instead."""
    from .supertable import super_k

    ks = super_k(cfg) if ks is None else ks
    if ks * cfg.nz <= 8 * 128:
        return True
    return ks <= 8 and cfg.nz % _ZBLOCK == 0


def p2g_accumulate_pallas_super(cfg: SimConfig, slots, tx: int = 1, ty: int = 8,
                                preshift: bool = True,
                                batched: bool | None = None,
                                combo_chunk: int | None = None,
                                zblock: int | None = None):
    """slots: (sx, sy, Ks, 8, sz) supercell table.  Returns (accs, amts):
    two lists of three (nx, ny, nz) cell-indexed accumulator grids.

    ty must be 8 (output block sublane constraint); tx=1 keeps the halo
    input blocks + in-kernel temps within the ~16 MB VMEM budget at Ks=8,
    nz=128.

    preshift=True passes the three z-shifted windows of every field as 21
    SEPARATE 128-lane-aligned inputs so the kernel does NO lane slicing.
    The 7-input form slices ``[1+dz : 1+dz+nz]`` off a 130-lane block in
    the kernel, and Mosaic's relayout of those misaligned lane slices is
    what actually bound the kernel: a null probe with the identical
    Element-halo DMA but no compute runs 7.7 ms where the 7-input kernel
    runs 44 ms at 128^3 (scripts/diag_p2g_dma.py) — the 3x input-DMA cost
    of the pre-shifted copies is far below the ~36 ms of in-kernel lane
    relayouts they remove (same pathology and fix as core/pallas_pack.py).

    batched=True folds the 16 (parity x window-offset) combos into ONE
    stacked tensor per operation (weights, Ks-reduction, accumulation all
    act on (16, tx, ty, Ks, nz)): the unbatched form issues ~240 jnp ops
    per program on 8-vreg tensors and is bound by Mosaic's per-op setup
    overhead, not vector work (the null-DMA probe runs 7.7 ms vs the
    kernel's 44 — scripts/diag_p2g_dma.py).  Accumulation order is kept
    identical (per-parity window terms added in the original (ox, oy)
    sequence via per-slot adds of the (4, tx, ty, nz) term stack; the
    always-zero "dead" window terms are added as exact +-0 instead of
    skipped), and products share the unbatched grouping — but the
    Ks-axis reduction runs over a 5-D stacked tensor, whose reduce tree
    the backend may shape differently than the 4-D unbatched one, so
    agreement is ~1 ulp (measured max 1.2e-7 abs on O(1) amounts,
    tests/test_pallas_p2g_super.py), not bit-exact.

    combo_chunk (16 | 8 | 4) processes the 16 combos in whole-parity
    chunks: the VMEM fallback if the full 16-combo stacks blow the 16 MB
    scoped limit on real Mosaic (estimated live set at chunk 16 is
    ~10 MB input blocks + ~9 MB stacked temps — marginal).  Chunks hold
    whole parities and each output slot still receives its 4 window
    terms in the same s order, so chunking only re-shapes reduce trees
    (same ~1 ulp class as batching itself).

    zblock (round 5): lane-dim block width.  None auto-selects: full nz
    when Ks*nz fits the flagship budget (the exact round-4 program), else
    _ZBLOCK-lane z blocks over a third grid dimension — the pre-shifted z
    windows make z blocks halo-free, so 256^3 compiles with the flagship
    live set.  Per-z-block arithmetic is the same window sums over a lane
    slice; results are bit-identical to the unblocked kernel (each output
    lane's reduce tree is unchanged — reductions run over Ks/window dims,
    never over z)."""
    env_batched, env_chunk = _batched_default()
    if batched is None:
        batched = env_batched
    if combo_chunk is None:
        combo_chunk = env_chunk
    assert F == (2, 2, 1)
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    sx, sy = nx // 2, ny // 2
    Ks = slots.shape[2]
    assert sx % tx == 0 and sy % ty == 0
    if zblock is None:
        zblock = nz if Ks * nz <= 8 * 128 else _ZBLOCK
    zB = min(zblock, nz)
    assert nz % zB == 0, (nz, zB)
    nzb = nz // zB
    if nzb > 1:
        assert preshift, "z-blocking relies on pre-shifted z windows"

    padded = [
        jnp.pad(slots[:, :, :, i, :], ((1, 1), (1, 1), (0, 0), (1, 1)))
        for i in range(7)
    ]  # each (sx+2, sy+2, Ks, nz+2)
    if preshift:
        # 21 z-aligned windows: dz-major so kernel group di*7:(di+1)*7 is
        # the 7 fields at z-shift dz = di-1.  XLA pays three cheap strided
        # copies; the kernel never touches a misaligned lane offset.
        fields = [
            p[:, :, :, 1 + dz : 1 + dz + nz]
            for dz in (-1, 0, 1)
            for p in padded
        ]  # each (sx+2, sy+2, Ks, nz)
    else:
        fields = padded

    n_in = 21 if preshift else 7

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in : n_in + 6]
        i = pl.program_id(0)
        j = pl.program_id(1)
        zk = pl.program_id(2) if nzb > 1 else 0
        sx0 = jnp.asarray(i * tx, jnp.float32)
        sy0 = jnp.asarray(j * ty, jnp.float32)

        if not preshift:
            px, py, pz, vx, vy, vz, pres = [r[:] for r in ins]

        # Slot-relative coordinates, hoisted OUT of the window loops: with
        # gxh the slot's OWN supercell x (halo extent), qx = px - 2*gxh is
        # small (in [-0.5, 1.5) for present slots), and the per-window
        # per-parity rel coordinate is relx = qx + (2*ox - parx) — all
        # operands exact in f32 (diffs of nearby values / small integers),
        # so results are bit-identical to the direct px - fx form while the
        # expensive tensors (z-shift relayouts, hat weights, membership
        # offsets) are computed once per (dz | parx,ox | pary,oy) instead
        # of once per window term.
        gxh = (sx0 - 1.0) + jax.lax.broadcasted_iota(
            jnp.int32, (tx + 2, 1, 1, 1), 0
        ).astype(jnp.float32)
        gyh = (sy0 - 1.0) + jax.lax.broadcasted_iota(
            jnp.int32, (1, ty + 2, 1, 1), 1
        ).astype(jnp.float32)
        fz = (jnp.asarray(zk * zB, jnp.float32)
              + jax.lax.broadcasted_iota(
                  jnp.int32, (1, 1, 1, zB), 3
              ).astype(jnp.float32))

        if batched:
            assert combo_chunk in (4, 8, 16)
            NG = 16 // combo_chunk
            PG = combo_chunk // 4  # parities per chunk
            ACC = [[jnp.zeros((PG, tx, ty, zB), jnp.float32)
                    for _ in range(NG)] for _ in range(3)]
            AMT = [[jnp.zeros((PG, tx, ty, zB), jnp.float32)
                    for _ in range(NG)] for _ in range(3)]
        else:
            acc = [
                [jnp.zeros((tx, ty, zB), jnp.float32) for _ in range(3)]
                for _ in range(4)
            ]
            amt = [
                [jnp.zeros((tx, ty, zB), jnp.float32) for _ in range(3)]
                for _ in range(4)
            ]

        def hat(r):
            return jnp.maximum(0.0, 1.0 - jnp.abs(r))

        for di, dz in enumerate((-1, 0, 1)):
            if preshift:
                # Pre-shifted z windows arrive as aligned inputs: no lane
                # slicing, no relayouts.
                pxz, pyz, pzz, vxz, vyz, vzz, presz = [
                    r[:] for r in ins[di * 7 : (di + 1) * 7]
                ]
                velz = (vxz, vyz, vzz)
            else:
                zs_ = slice(1 + dz, 1 + dz + nz)
                # One lane relayout per field per dz (7*3 total).
                pxz = px[:, :, :, zs_]
                pyz = py[:, :, :, zs_]
                pzz = pz[:, :, :, zs_]
                velz = (vx[:, :, :, zs_], vy[:, :, :, zs_], vz[:, :, :, zs_])
                presz = pres[:, :, :, zs_]

            qz = pzz - fz
            zn = hat(qz)
            zs_w = hat(qz - 0.5)
            qx = pxz - 2.0 * gxh
            qy = pyz - 2.0 * gyh
            dcx0 = jnp.floor(pxz + 0.5) - 2.0 * gxh
            dcy0 = jnp.floor(pyz + 0.5) - 2.0 * gyh

            if batched:
                XC = [(parx, ox) for parx in range(2)
                      for ox in ((-1, 0) if parx == 0 else (0, 1))]
                YC = [(pary, oy) for pary in range(2)
                      for oy in ((-1, 0) if pary == 0 else (0, 1))]
                # Stacked x families (4, tx, ty+2, Ks, nz): same arithmetic
                # as the unbatched xw dict, one op per expression.
                QXs = jnp.stack([qx[1 + ox : 1 + ox + tx] for _, ox in XC])
                DXs = jnp.stack(
                    [dcx0[1 + ox : 1 + ox + tx] for _, ox in XC])
                # CX[i] = 2*ox - parx over XC = [-2, 0, -1, 1]: built from
                # an in-kernel iota (Pallas rejects closed-over constants).
                fam_i = jax.lax.broadcasted_iota(
                    jnp.int32, (4, 1, 1, 1, 1), 0)
                CX = (2 * (fam_i % 2) + fam_i // 2 - 2).astype(jnp.float32)
                RX = QXs + CX
                DCX = DXs + CX
                Xn = jnp.where((DCX >= -1.0) & (DCX <= 1.0), hat(RX), 0.0)
                Xs_ = jnp.where((DCX >= 0.0) & (DCX <= 1.0),
                                hat(RX - 0.5), 0.0)
                # Stacked y families (4, tx+2, ty, Ks, nz), presence folded.
                QYs = jnp.stack(
                    [qy[:, 1 + oy : 1 + oy + ty] for _, oy in YC])
                DYs = jnp.stack(
                    [dcy0[:, 1 + oy : 1 + oy + ty] for _, oy in YC])
                PZs = jnp.stack(
                    [presz[:, 1 + oy : 1 + oy + ty] for _, oy in YC])
                CY = CX  # YC has the identical (par, offset) structure
                RY = QYs + CY
                DCY = DYs + CY
                Yn = jnp.where((DCY >= -1.0) & (DCY <= 1.0),
                               hat(RY), 0.0) * PZs
                Ys_ = jnp.where((DCY >= 0.0) & (DCY <= 1.0),
                                hat(RY - 0.5), 0.0) * PZs

                # Combo index c = p*4 + s with p = parx*2+pary the parity
                # and s = oxi*2+oyi the window slot, matching the unbatched
                # loop order exactly.
                combos = []
                for parx in range(2):
                    for pary in range(2):
                        oxs = (-1, 0) if parx == 0 else (0, 1)
                        oys = (-1, 0) if pary == 0 else (0, 1)
                        for oxi, ox in enumerate(oxs):
                            for oyi, oy in enumerate(oys):
                                combos.append((
                                    parx * 2 + oxi, pary * 2 + oyi,
                                    slice(1 + ox, 1 + ox + tx),
                                    slice(1 + oy, 1 + oy + ty),
                                ))

                for g in range(NG):
                    sub = combos[g * combo_chunk : (g + 1) * combo_chunk]

                    def cstack(f):
                        return jnp.stack([f(*c) for c in sub])

                    WNX = cstack(lambda xi, yi, A, B: Xn[xi][:, B])
                    WSX = cstack(lambda xi, yi, A, B: Xs_[xi][:, B])
                    WNY = cstack(lambda xi, yi, A, B: Yn[yi][A])
                    WSY = cstack(lambda xi, yi, A, B: Ys_[yi][A])
                    ZNC = cstack(lambda xi, yi, A, B: zn[A, B])
                    VUC = cstack(lambda xi, yi, A, B: velz[0][A, B])
                    VVC = cstack(lambda xi, yi, A, B: velz[1][A, B])

                    wu = WNY * WSX * ZNC
                    TU = (wu * VUC).sum(3).reshape(PG, 4, tx, ty, zB)
                    AU = wu.sum(3).reshape(PG, 4, tx, ty, zB)
                    wv = WNX * WSY * ZNC
                    TV = (wv * VVC).sum(3).reshape(PG, 4, tx, ty, zB)
                    AV = wv.sum(3).reshape(PG, 4, tx, ty, zB)
                    for t in range(4):
                        ACC[0][g] = ACC[0][g] + TU[:, t]
                        AMT[0][g] = AMT[0][g] + AU[:, t]
                        ACC[1][g] = ACC[1][g] + TV[:, t]
                        AMT[1][g] = AMT[1][g] + AV[:, t]
                    if dz in (0, 1):
                        ZSC = cstack(lambda xi, yi, A, B: zs_w[A, B])
                        VWC = cstack(lambda xi, yi, A, B: velz[2][A, B])
                        ww = WNY * WNX * ZSC
                        TW = (ww * VWC).sum(3).reshape(PG, 4, tx, ty, zB)
                        AW = ww.sum(3).reshape(PG, 4, tx, ty, zB)
                        for t in range(4):
                            ACC[2][g] = ACC[2][g] + TW[:, t]
                            AMT[2][g] = AMT[2][g] + AW[:, t]
                continue

            # Per (parity, offset) 1-D family tensors on the halo extent;
            # window terms below take free outer-dim slices of these.
            # Membership masks are FOLDED into the weight tensors here (one
            # where() per family member instead of two extra multiplies per
            # window term below).  wgt = w * mask and wgt = where(mask, w, 0)
            # are bit-identical (w finite, mask in {0,1}).
            xw = {}
            for parx in range(2):
                for ox in ((-1, 0) if parx == 0 else (0, 1)):
                    A = slice(1 + ox, 1 + ox + tx)
                    cx = jnp.float32(2 * ox - parx)
                    rx = qx[A] + cx
                    dcx = dcx0[A] + cx
                    mx_n = (dcx >= -1.0) & (dcx <= 1.0)
                    mx_s = (dcx >= 0.0) & (dcx <= 1.0)
                    xw[parx, ox] = (
                        jnp.where(mx_n, hat(rx), 0.0),
                        jnp.where(mx_s, hat(rx - 0.5), 0.0),
                    )
            # Presence (exact 0/1) is folded into the y-family too, so the
            # window terms below need no separate `base` multiply.
            yw = {}
            for pary in range(2):
                for oy in ((-1, 0) if pary == 0 else (0, 1)):
                    B = slice(1 + oy, 1 + oy + ty)
                    cy = jnp.float32(2 * oy - pary)
                    ry = qy[:, B] + cy
                    dcy = dcy0[:, B] + cy
                    my_n = (dcy >= -1.0) & (dcy <= 1.0)
                    my_s = (dcy >= 0.0) & (dcy <= 1.0)
                    pz_b = presz[:, B]
                    yw[pary, oy] = (
                        jnp.where(my_n, hat(ry), 0.0) * pz_b,
                        jnp.where(my_s, hat(ry - 0.5), 0.0) * pz_b,
                    )

            for parx in range(2):
                for pary in range(2):
                    p = parx * 2 + pary
                    for ox in ((-1, 0) if parx == 0 else (0, 1)):
                        for oy in ((-1, 0) if pary == 0 else (0, 1)):
                            A = slice(1 + ox, 1 + ox + tx)
                            B = slice(1 + oy, 1 + oy + ty)
                            wn_x, ws_x = [t[:, B] for t in xw[parx, ox]]
                            wn_y, ws_y = [t[A] for t in yw[pary, oy]]
                            znb = zn[A, B]
                            # Fully-dead component/window combos: the
                            # staggered-x membership (cells {0,1}) can never
                            # hold for parx=0, ox=-1 (slot cells {-2,-1});
                            # same along y.  Skip them outright.
                            u_dead = parx == 0 and ox == -1
                            v_dead = pary == 0 and oy == -1
                            if not u_dead:
                                wgt = wn_y * ws_x * znb
                                acc[p][0] = acc[p][0] + (
                                    wgt * velz[0][A, B]
                                ).sum(2)
                                amt[p][0] = amt[p][0] + wgt.sum(2)
                            if not v_dead:
                                wgt = wn_x * ws_y * znb
                                acc[p][1] = acc[p][1] + (
                                    wgt * velz[1][A, B]
                                ).sum(2)
                                amt[p][1] = amt[p][1] + wgt.sum(2)
                            if dz in (0, 1):
                                wgt = wn_y * wn_x * zs_w[A, B]
                                acc[p][2] = acc[p][2] + (
                                    wgt * velz[2][A, B]
                                ).sum(2)
                                amt[p][2] = amt[p][2] + wgt.sum(2)
        if batched:
            for a in range(3):
                outs[2 * a][:] = (
                    ACC[a][0] if NG == 1
                    else jnp.concatenate(ACC[a], axis=0)
                )
                outs[2 * a + 1][:] = (
                    AMT[a][0] if NG == 1
                    else jnp.concatenate(AMT[a], axis=0)
                )
        else:
            for p in range(4):
                for a in range(3):
                    outs[2 * a][p] = acc[p][a]
                    outs[2 * a + 1][p] = amt[p][a]

    if nzb > 1:
        # 3-D grid: z blocks are halo-free (the shifted windows are
        # separate aligned inputs), so the lane dim blocks at zB (% 128)
        # with plain aligned starts — live set stays at the flagship size.
        in_spec = pl.BlockSpec(
            (pl.Element(tx + 2), pl.Element(ty + 2), pl.Element(Ks),
             pl.Element(zB)),
            lambda i, j, z: (i * tx, j * ty, 0, z * zB),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (4, tx, ty, zB), lambda i, j, z: (0, i, j, z),
            memory_space=pltpu.VMEM,
        )
        grid = (sx // tx, sy // ty, nzb)
    else:
        zdim = nz if preshift else nz + 2
        in_spec = pl.BlockSpec(
            (pl.Element(tx + 2), pl.Element(ty + 2), pl.Element(Ks),
             pl.Element(zdim)),
            lambda i, j: (i * tx, j * ty, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (4, tx, ty, nz), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        )
        grid = (sx // tx, sy // ty)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(
            jax.ShapeDtypeStruct((4, sx, sy, nz), jnp.float32)
            for _ in range(6)
        ),
        in_specs=[in_spec] * n_in,
        out_specs=(out_spec,) * 6,
        interpret=jax.default_backend() != "tpu",
    )(*fields)

    def interleave(a):
        # (4, sx, sy, nz) parity-packed -> (nx, ny, nz).
        a = a.reshape(2, 2, sx, sy, nz)
        return a.transpose(2, 0, 3, 1, 4).reshape(nx, ny, nz)

    accs = [interleave(outs[2 * a]) for a in range(3)]
    amts = [interleave(outs[2 * a + 1]) for a in range(3)]
    return accs, amts


def p2g_from_super_pallas(cfg: SimConfig, table, pos=None, vel=None):
    """Full supercell P2G using the Pallas accumulator kernel;
    normalization, boundary handling, and overflow correction identical to
    supertable.p2g_from_super."""
    from . import celltable as ct

    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    pc = pos * jnp.array([nx, ny, nz], jnp.float32) if pos is not None else None
    accs, amts = p2g_accumulate_pallas_super(cfg, table.slots)
    out = []
    for a, shape in ((0, (nx + 1, ny, nz)), (1, (nx, ny + 1, nz)), (2, (nx, ny, nz + 1))):
        pad = [(0, 0)] * 3
        pad[a] = (1, 0)
        acc = jnp.pad(accs[a], pad)
        amt = jnp.pad(amts[a], pad)
        if pc is not None:
            acc, amt = ct._overflow_scatter(cfg, table, pc, vel, a, shape, acc, amt)
        g = acc / jnp.maximum(amt, jnp.float32(1e-30))
        valid = amt > cfg.zero_thresh
        for edge in (0, (nx, ny, nz)[a]):
            sl = [slice(None)] * 3
            sl[a] = edge
            g = g.at[tuple(sl)].set(0.0)
            valid = valid.at[tuple(sl)].set(True)
        out.append((g, valid))
    (u, uv), (v, vv), (w, wv) = out
    return u, v, w, uv, vv, wv

"""NumPy oracle: 2D PIC/FLIP solver (FluidSim semantics, Simulation2D.cpp).

The 2D solver is the reference's first stepping stone (README.md:81) and a
deliverable config (BASELINE.json config 1).  Notable 2D-specific behavior,
all replicated:
  * curl-noise initial velocity field from the 'peaks' function
    (Simulation2D.cpp:810-845), particle velocities sampled from it;
  * Zhao-style 4-sweep level set (Simulation2D.cpp:280-314);
  * 120 SOR iterations with omega = 2 - 3.22133/nx (Simulation2D.cpp:699-701);
  * the air-side pressure-gradient case uses '+' where the 3D solver uses '-'
    (Simulation2D.cpp:780 vs Simulation3D.cpp:1032 — the 3D comment "It was
    not." records the 2D sign as the buggy one; preserved per-solver);
  * particle radius 2/sqrt(2) (Simulation2D.h:203).
"""

from __future__ import annotations

import numpy as np

from ..core.config import SimConfig2D
from ..core.lcg import minstd_uniform_stream


# -- curl-noise init (Simulation2D.cpp:810-845) ------------------------------

def peaks(x, y):
    return (
        3.0 * (1.0 - x) ** 2 * np.exp(-x * x - (y + 1.0) ** 2)
        - 10.0 * (0.2 * x - x**3 + y**5) * np.exp(-x * x - y * y)
        - np.exp(-((x + 1.0) ** 2) - y * y) / 3.0
    )


def vector_function(x, y):
    eps = 1e-5
    p0 = peaks(x, y)
    dx = (peaks(x + eps, y) - p0) / eps
    dy = (peaks(x, y + eps) - p0) / eps
    return dx, dy


def vector_curl(x, y):
    fx, fy = vector_function(6.0 * x - 3.0, 6.0 * y - 3.0)
    return 0.1 * fy, -0.1 * fx


# -- interpolation (Simulation2D.h:59-100) ----------------------------------

def interp_mac(u, v, pi, pj):
    nx = u.shape[0] - 1
    ny = v.shape[1] - 1

    def split_n(c, m):
        n = np.clip(c, 0.0, m - 1.0)
        i = np.minimum(np.floor(n), m - 2.0)
        return i.astype(np.int64), (n - i).astype(np.float32)

    def split_e(c, m):
        e = np.clip(c + 0.5, 0.0, float(m))
        i = np.minimum(np.floor(e), m - 1.0)
        return i.astype(np.int64), (e - i).astype(np.float32)

    iI, fI = split_n(pi, nx)
    iJ, fJ = split_n(pj, ny)
    iEI, fEI = split_e(pi, nx)
    iEJ, fEJ = split_e(pj, ny)

    def bi(g, i, j, fi, fj):
        def L(a, b, t):
            return a + (b - a) * t

        return L(L(g[i, j], g[i + 1, j], fi), L(g[i, j + 1], g[i + 1, j + 1], fi), fj)

    return bi(u, iEI, iJ, fEI, fJ), bi(v, iI, iEJ, fI, fEJ)


# -- init (Simulation2D.cpp:38-78) ------------------------------------------

def reset(cfg: SimConfig2D):
    nx, ny = cfg.nx, cfg.ny
    cpm = cfg.cells_per_meter
    xs = (np.arange(nx + 1, dtype=np.float64)) / cpm
    yc = (np.arange(ny, dtype=np.float64) + 0.5) / cpm
    u = np.empty((nx + 1, ny), np.float32)
    ux, _ = vector_curl(xs[:, None], yc[None, :])
    u[:, :] = ux
    xc = (np.arange(nx, dtype=np.float64) + 0.5) / cpm
    ys = (np.arange(ny + 1, dtype=np.float64)) / cpm
    _, vy = vector_curl(xc[:, None], ys[None, :])
    v = vy.astype(np.float32)

    # Dam-break particles: x in [nx/2, nx-1), y in [1, ny-1), 2x2 per cell,
    # loop order y, x, u, v with 2 jitter draws per particle.
    ys_ = np.arange(1, ny - 1, dtype=np.float32)
    xs_ = np.arange(nx // 2, nx - 1, dtype=np.float32)
    us = np.arange(2, dtype=np.float32)
    Y, X, U, V = np.meshgrid(ys_, xs_, us, us, indexing="ij")
    base = np.stack(
        [(X.ravel() - 0.25) / cpm, (Y.ravel() - 0.25) / cpm], axis=-1
    )
    d = np.float32(0.5 / cpm)
    sub = np.stack([U.ravel(), V.ravel()], axis=-1) * d
    n = len(base)
    jit = minstd_uniform_stream(2 * n, -0.25, 0.25, seed=cfg.seed).reshape(n, 2)
    pos = (base + sub + jit / cpm).astype(np.float32)
    vel = np.stack(
        interp_mac(u, v, nx * pos[:, 0], ny * pos[:, 1]), axis=-1
    ).astype(np.float32)
    return pos, vel, u, v


# -- stages ------------------------------------------------------------------

def advect(cfg: SimConfig2D, u, v, pos, dt):
    m = np.array([cfg.nx, cfg.ny], np.float32)

    def vel_at(p):
        return np.stack(interp_mac(u, v, m[0] * p[:, 0], m[1] * p[:, 1]), axis=-1)

    k1 = vel_at(pos)
    k2 = vel_at(pos + 0.5 * dt * k1)
    k3 = vel_at(pos + 0.75 * dt * k2)
    newpos = pos + dt * ((2 / 9) * k1 + (3 / 9) * k2 + (4 / 9) * k3)
    eps = 0.1
    return np.clip(newpos, (-0.5 + eps) / m, 1.0 + (-0.5 - eps) / m).astype(np.float32)


def compute_level_set(cfg: SimConfig2D, pos):
    """Seed + 4 Zhao sweeps (Simulation2D.cpp:203-317)."""
    nx, ny = cfg.nx, cfg.ny
    r = cfg.particle_radius
    m = np.array([nx, ny], np.float64)
    pc = pos * m
    phi = np.full((nx, ny), np.inf, np.float32)
    closest = np.full((nx, ny), -1, np.int64)

    cell = np.round(pc).astype(np.int64)
    for i in range(len(pc)):
        x, y = cell[i]
        if x < 0 or x >= nx or y < 0 or y >= ny:
            continue
        k = np.sqrt((pc[i, 0] - x) ** 2 + (pc[i, 1] - y) ** 2) - r
        if closest[x, y] < 0 or phi[x, y] > k:
            closest[x, y] = i
            phi[x, y] = k

    # Native fast path (native/oracle.cpp) — identical semantics.
    from . import native as _native

    pc32 = pc.astype(np.float32)
    if _native.fs2_sweeps(nx, ny, r, pc32, phi, closest):
        return phi, closest

    def inner(dx, dy, x, y):
        o = closest[x + dx, y + dy]
        if o > 0:  # sic: particle 0 never propagates (Simulation2D.cpp:192)
            d = np.sqrt((pc[o, 0] - x) ** 2 + (pc[o, 1] - y) ** 2) - r
            if closest[x, y] < 0 or d < phi[x, y]:
                closest[x, y] = o
                phi[x, y] = d

    # Sweep 1: y fwd, x fwd; looks x-, y- (Simulation2D.cpp:280-287)
    for y in range(ny):
        for x in range(nx):
            if x != 0:
                inner(-1, 0, x, y)
            if y != 0:
                inner(0, -1, x, y)
    # Sweep 2: x bwd outer, y fwd inner; looks x+, y-
    for x in range(nx - 1, -1, -1):
        for y in range(ny):
            if x != nx - 1:
                inner(1, 0, x, y)
            if y != 0:
                inner(0, -1, x, y)
    # Sweep 3: x bwd, y bwd; looks x+, y+
    for x in range(nx - 1, -1, -1):
        for y in range(ny - 1, -1, -1):
            if x != nx - 1:
                inner(1, 0, x, y)
            if y != ny - 1:
                inner(0, 1, x, y)
    # Sweep 4: x fwd, y bwd; looks x-, y+
    for x in range(nx):
        for y in range(ny - 1, -1, -1):
            if x != 0:
                inner(-1, 0, x, y)
            if y != ny - 1:
                inner(0, 1, x, y)
    return phi, closest


def transfer_particles_to_grid(cfg: SimConfig2D, pos, vel):
    nx, ny = cfg.nx, cfg.ny
    cpm = cfg.cells_per_meter
    p = pos * cpm
    keep = (
        (p[:, 0] >= -0.5) & (p[:, 0] <= nx + 0.5)
        & (p[:, 1] >= -0.5) & (p[:, 1] <= ny + 0.5)
    )
    p = p[keep]
    pv = vel[keep]

    def scatter(comp_axis, shape):
        acc = np.zeros(shape, np.float32)
        amt = np.zeros(shape, np.float32)
        base = np.empty((len(p), 2), np.int64)
        alpha = np.empty((len(p), 2), np.float32)
        for ax in range(2):
            c = p[:, ax] + (0.5 if ax == comp_axis else 0.0)
            b = np.floor(c)
            base[:, ax] = b
            alpha[:, ax] = c - b
        dims = (nx, ny)
        for ox in (0, 1):
            for oy in (0, 1):
                offs = (ox, oy)
                idx = base + np.array(offs)
                ok = np.ones(len(p), bool)
                for ax in range(2):
                    hi = dims[ax] + (1 if ax == comp_axis else 0)
                    ok &= (idx[:, ax] >= 0) & (idx[:, ax] < hi)
                wgt = np.ones(len(p), np.float32)
                for ax in range(2):
                    a = alpha[:, ax]
                    wgt = wgt * np.where(offs[ax] > 0, a, 1.0 - a)
                ii = idx[ok]
                np.add.at(acc, (ii[:, 0], ii[:, 1]), wgt[ok] * pv[ok, comp_axis])
                np.add.at(amt, (ii[:, 0], ii[:, 1]), wgt[ok])
        return acc, amt

    u, ua = scatter(0, (nx + 1, ny))
    v, va = scatter(1, (nx, ny + 1))
    tiny = np.float64(np.finfo(np.float32).smallest_subnormal)
    u = (u / (tiny + ua)).astype(np.float32)
    v = (v / (tiny + va)).astype(np.float32)

    uv = ua > cfg.zero_thresh
    vv = va > cfg.zero_thresh
    u[0, :] = 0
    u[nx, :] = 0
    v[:, 0] = 0
    v[:, ny] = 0
    uv[0, :] = True
    uv[nx, :] = True
    vv[:, 0] = True
    vv[:, ny] = True
    extrapolate_values(u, uv)
    extrapolate_values(v, vv)
    return u, v, uv, vv


def extrapolate_values(src, valid):
    """2D bucket extrapolation (Simulation2D.cpp:443-581), level-parallel."""
    inf = np.int64(10**9)
    cd = np.where(valid, 0, inf)
    for ax, rev in [(0, False), (0, True), (1, False), (1, True)]:
        n = cd.shape[ax]
        rng = range(1, n) if not rev else range(n - 2, -1, -1)
        step = -1 if not rev else 1
        sl = [slice(None)] * 2
        sl2 = [slice(None)] * 2
        for i in rng:
            sl[ax] = i
            sl2[ax] = i + step
            cd[tuple(sl)] = np.minimum(cd[tuple(sl)], cd[tuple(sl2)] + 1)
    maxd = int(cd.max())

    def shift2(a, ax, s, fill):
        out = np.full_like(a, fill)
        src_sl = [slice(None)] * 2
        dst_sl = [slice(None)] * 2
        if s == 1:
            dst_sl[ax] = slice(0, a.shape[ax] - 1)
            src_sl[ax] = slice(1, None)
        else:
            dst_sl[ax] = slice(1, None)
            src_sl[ax] = slice(0, a.shape[ax] - 1)
        out[tuple(dst_sl)] = a[tuple(src_sl)]
        return out

    for d in range(1, maxd + 1):
        mask = cd == d
        if not mask.any():
            continue
        num = np.zeros(src.shape, np.float32)
        tot = np.zeros(src.shape, np.float32)
        for ax in range(2):
            for s in (-1, 1):
                nb_cd = shift2(cd, ax, s, inf)
                nb_v = shift2(src, ax, s, 0.0)
                use = nb_cd < d
                num += use
                tot += np.where(use, nb_v, 0.0)
        upd = mask & (num > 0)
        src[upd] = (tot[upd] / num[upd]).astype(src.dtype)
    return src


def project(cfg: SimConfig2D, u, v, phi, dt):
    """2D projection (Simulation2D.cpp:593-808), float64 SOR, 120 iters."""
    nx, ny = cfg.nx, cfg.ny
    maxr = cfg.max_ls_ratio
    dx = 1.0 / cfg.cells_per_meter
    scale = -dx * cfg.rho / dt
    phid = phi.astype(np.float64)
    fluid = phid < 0.0

    b = scale * (
        u[1:, :].astype(np.float64) - u[:-1, :] + v[:, 1:] - v[:, :-1]
    )

    def shift2(a, ax, s, fill):
        out = np.full(a.shape, fill, a.dtype)
        src_sl = [slice(None)] * 2
        dst_sl = [slice(None)] * 2
        if s == 1:
            dst_sl[ax] = slice(0, a.shape[ax] - 1)
            src_sl[ax] = slice(1, None)
        else:
            dst_sl[ax] = slice(1, None)
            src_sl[ax] = slice(0, a.shape[ax] - 1)
        out[tuple(dst_sl)] = a[tuple(src_sl)]
        return out

    diag = np.zeros((nx, ny), np.float64)
    for ax in range(2):
        for s in (-1, 1):
            nb = shift2(phid, ax, s, np.inf)
            has = np.ones_like(fluid)
            sl = [slice(None)] * 2
            sl[ax] = 0 if s == -1 else -1
            has[tuple(sl)] = False
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = np.clip(-nb / np.where(phid != 0, phid, 1e-300), 0.0, maxr)
            diag += np.where(has, 1.0, 0.0) + np.where(has & (nb > 0), ratio, 0.0)
    safe_diag = np.where(fluid, diag, 1.0)

    omega = cfg.omega
    p = np.zeros((nx, ny), np.float64)
    xg, yg = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    parity = (xg + yg) % 2
    for _ in range(cfg.sor_iterations):
        for stage in (0, 1):
            nms = np.zeros_like(p)
            for ax in range(2):
                for s in (-1, 1):
                    nb_f = shift2(fluid, ax, s, False)
                    nb_p = shift2(p, ax, s, 0.0)
                    nms -= np.where(nb_f, nb_p, 0.0)
            upd = (1 - omega) * p + omega * (b - nms) / safe_diag
            p = np.where(fluid & (parity == stage), upd, p)

    # Edges, then 4-case updates (note 2D '+' sign in the air-left case).
    v[:, 0] = 0
    v[:, ny] = 0
    u[0, :] = 0
    u[nx, :] = 0
    scale2 = dt / (cfg.rho * dx)

    with np.errstate(divide="ignore", invalid="ignore"):
        # U faces x=1..nx-1
        phiL, phiR = phid[:-1, :], phid[1:, :]
        pL, pR = p[:-1, :], p[1:, :]
        cur = u[1:nx, :].astype(np.float64)
        safeL = np.where(phiL != 0, phiL, -1e-300)
        safeR = np.where(phiR != 0, phiR, -1e-300)
        val = np.where(
            (phiL < 0) & (phiR < 0),
            cur - scale2 * (pR - pL),
            np.where(
                (phiL < 0) & (phiR >= 0),
                cur + scale2 * (1 + np.clip(-phiR / safeL, 0, maxr)) * pL,
                np.where(
                    (phiL >= 0) & (phiR < 0),
                    cur + scale2 * (1 + np.clip(-phiL / safeR, 0, maxr)) * pR,
                    0.0,
                ),
            ),
        )
        u[1:nx, :] = val.astype(np.float32)

        phiD, phiU = phid[:, :-1], phid[:, 1:]
        pD, pU = p[:, :-1], p[:, 1:]
        cur = v[:, 1:ny].astype(np.float64)
        safeD = np.where(phiD != 0, phiD, -1e-300)
        safeU = np.where(phiU != 0, phiU, -1e-300)
        val = np.where(
            (phiD < 0) & (phiU < 0),
            cur - scale2 * (pU - pD),
            np.where(
                (phiD < 0) & (phiU >= 0),
                cur + scale2 * (1 + np.clip(-phiU / safeD, 0, maxr)) * pD,
                np.where(
                    (phiD >= 0) & (phiU < 0),
                    cur + scale2 * (1 + np.clip(-phiD / safeU, 0, maxr)) * pU,
                    0.0,
                ),
            ),
        )
        v[:, 1:ny] = val.astype(np.float32)
    return p


class FluidSimRef:
    """Stateful 2D oracle mirroring FluidSim::Simulate (Simulation2D.cpp:80)."""

    def __init__(self, cfg: SimConfig2D):
        self.cfg = cfg
        self.pos, self.vel, self.u, self.v = reset(cfg)
        self.phi = np.full((cfg.nx, cfg.ny), np.inf, np.float32)

    def simulate(self, dt: float):
        cfg = self.cfg
        dt = float(np.clip(dt, 0.0, cfg.max_dt))
        self.pos = advect(cfg, self.u, self.v, self.pos, dt)
        alpha = float(np.clip(6 * dt * cfg.nu * cfg.cells_per_meter**2, 0.0, 1.0))
        self.phi, _ = compute_level_set(cfg, self.pos)
        self.u, self.v, _, _ = transfer_particles_to_grid(cfg, self.pos, self.vel)
        old_u, old_v = self.u.copy(), self.v.copy()
        self.v += np.float32(cfg.gravity_y * dt)
        project(cfg, self.u, self.v, self.phi, dt)
        du = self.u - (1.0 - alpha) * old_u
        dv = self.v - (1.0 - alpha) * old_v
        m = np.array([cfg.nx, cfg.ny], np.float32)
        diff = np.stack(
            interp_mac(du, dv, m[0] * self.pos[:, 0], m[1] * self.pos[:, 1]), axis=-1
        )
        self.vel = ((1.0 - alpha) * self.vel + diff).astype(np.float32)

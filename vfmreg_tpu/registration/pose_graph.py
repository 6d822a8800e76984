"""SE(3) pose-graph optimization — the GTSAM iSAM2 replacement.

Reimplements the capability of `vfm_reg/pose_graph_optimization.py:10-167`
(reference #37: prior / odometry / loop-closure factors, optimize-on-loop) as a
batched Gauss-Newton solver in JAX instead of wrapping GTSAM:

  * state: [N, 4, 4] poses; residuals per factor e_ij = log( Z_ij^-1 T_i^-1 T_j )
    weighted by per-factor 6-vector information (GLIM-style noise defaults, same
    spirit as the reference's `odometry_noise` / `loop_noise`);
  * the normal equations are assembled densely over the 6N state (scan over
    factors with scatter-adds — pose graphs here are a few hundred nodes) and
    solved with a damped Cholesky step;
  * `optimize()` runs a fixed GN iteration budget (batched, jit-compiled).

`IncrementalPoseGraph` adds the reference's iSAM2 BEHAVIOR on top of the same
solver: the exact `PoseGraphOptimizationGtsam` API surface (chained
`add_odom_edge` initial estimates, `add_loop_edge`, `optimize_if_needed`'s
optimize-on-first-loop / min-factors policy, `pose_at(-1)`, fall back to the
initial estimate for never-optimized vertices), warm-started from the current
estimate, and solving only the ACTIVE WINDOW each update — every vertex
downstream of the earliest endpoint touched by new factors (the sub-graph a
new measurement can influence in a chain+loops topology), with upstream
vertices frozen as gauge. That bounds per-update work the way iSAM2's Bayes
tree does, without porting its factorization machinery to a TPU runtime where
the few-hundred-node dense GN solve is microseconds anyway.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from vfmreg_tpu.utils.precision import full_precision
import numpy as np

from vfmreg_tpu.geometry.se3 import exp_se3, inverse_se3, log_se3

# Reference noise defaults (GLIM paper parameters, `pose_graph_optimization.py`):
# odometry ~ (0.01 m, ~0.3 deg), loop closures looser, prior very tight.
PRIOR_SIGMAS = np.full(6, 1e-6)
ODOM_SIGMAS = np.array([0.01, 0.01, 0.01, 0.005, 0.005, 0.005])
LOOP_SIGMAS = np.array([0.1, 0.1, 0.1, 0.05, 0.05, 0.05])


class Factor(NamedTuple):
    i: int
    j: int  # j == -1 for priors
    measurement: np.ndarray  # [4, 4]
    sigmas: np.ndarray  # [6]


@partial(jax.jit, static_argnames=("num_iters",))
@full_precision
def _optimize(
    poses, fi, fj, meas, weights, active=None, num_iters: int = 20, damping: float = 1e-6
):
    """`active`: optional [N] bool — variables outside the active window are
    frozen (gauge) via a huge diagonal penalty, the incremental-update mode."""
    n = poses.shape[0]

    def residual_between(T_i, T_j, Z):
        return log_se3(inverse_se3(Z) @ inverse_se3(T_i) @ T_j)

    def gn_step(poses, _):
        T_i = poses[fi]
        T_j = jnp.where((fj >= 0)[:, None, None], poses[jnp.maximum(fj, 0)], jnp.eye(4))

        def factor_residual(Ti, Tj, Z, is_prior):
            r_between = residual_between(Ti, Tj, Z)
            r_prior = log_se3(inverse_se3(Z) @ Ti)
            return jnp.where(is_prior, r_prior, r_between)

        is_prior = fj < 0

        # Numerical Jacobians wrt the left-multiplied tangent of T_i and T_j —
        # 12 columns per factor, computed with jax.jacfwd over the perturbation.
        def perturbed_res(eps, Ti, Tj, Z, prior):
            dTi = exp_se3(eps[:6]) @ Ti
            dTj = exp_se3(eps[6:]) @ Tj
            return factor_residual(dTi, dTj, Z, prior)

        J = jax.vmap(
            lambda Ti, Tj, Z, p: jax.jacfwd(perturbed_res)(jnp.zeros(12), Ti, Tj, Z, p)
        )(T_i, T_j, meas, is_prior)  # [F, 6, 12]
        r = jax.vmap(factor_residual)(T_i, T_j, meas, is_prior)  # [F, 6]

        w = weights  # [F, 6] = 1/sigma^2
        Ji = J[:, :, :6]
        Jj = J[:, :, 6:]
        # Dense assembly of H [6N, 6N], b [6N] via scatter-add.
        H = jnp.zeros((6 * n, 6 * n))
        b = jnp.zeros((6 * n,))

        Hii = jnp.einsum("fri,fr,frj->fij", Ji, w, Ji)
        Hjj = jnp.einsum("fri,fr,frj->fij", Jj, w, Jj)
        Hij = jnp.einsum("fri,fr,frj->fij", Ji, w, Jj)
        bi = jnp.einsum("fri,fr,fr->fi", Ji, w, r)
        bj = jnp.einsum("fri,fr,fr->fi", Jj, w, r)

        def scatter_block(H, b, f):
            ii = 6 * fi[f]
            jj = 6 * jnp.maximum(fj[f], 0)
            valid_j = fj[f] >= 0
            H = jax.lax.dynamic_update_slice(
                H, jax.lax.dynamic_slice(H, (ii, ii), (6, 6)) + Hii[f], (ii, ii)
            )
            Hjj_f = jnp.where(valid_j, Hjj[f], jnp.zeros((6, 6)))
            H = jax.lax.dynamic_update_slice(
                H, jax.lax.dynamic_slice(H, (jj, jj), (6, 6)) + Hjj_f, (jj, jj)
            )
            Hij_f = jnp.where(valid_j, Hij[f], jnp.zeros((6, 6)))
            H = jax.lax.dynamic_update_slice(
                H, jax.lax.dynamic_slice(H, (ii, jj), (6, 6)) + Hij_f, (ii, jj)
            )
            H = jax.lax.dynamic_update_slice(
                H, jax.lax.dynamic_slice(H, (jj, ii), (6, 6)) + Hij_f.T, (jj, ii)
            )
            b = jax.lax.dynamic_update_slice(
                b, jax.lax.dynamic_slice(b, (ii,), (6,)) + bi[f], (ii,)
            )
            bj_f = jnp.where(valid_j, bj[f], jnp.zeros(6))
            b = jax.lax.dynamic_update_slice(
                b, jax.lax.dynamic_slice(b, (jj,), (6,)) + bj_f, (jj,)
            )
            return H, b

        H, b = jax.lax.fori_loop(
            0, fi.shape[0], lambda f, Hb: scatter_block(Hb[0], Hb[1], f), (H, b)
        )

        if active is None:
            diag_pen = jnp.full((6 * n,), damping)
        else:
            diag_pen = jnp.where(jnp.repeat(active, 6), damping, 1e12)
        dx = jnp.linalg.solve(H + jnp.diag(diag_pen), -b).reshape(n, 6)
        new_poses = jax.vmap(lambda d, T: exp_se3(d) @ T)(dx, poses)
        return new_poses, jnp.linalg.norm(dx)

    poses, _ = jax.lax.scan(gn_step, poses, None, length=num_iters)
    return poses


class PoseGraphOptimizer:
    """API analogue of `PoseGraphOptimizationGtsam`: add_prior / add_odometry /
    add_loop_closure / optimize / get_poses."""

    def __init__(self):
        self.initial: List[np.ndarray] = []
        self.factors: List[Factor] = []

    def add_pose(self, pose: np.ndarray) -> int:
        self.initial.append(np.asarray(pose, dtype=np.float64))
        return len(self.initial) - 1

    def add_prior(self, i: int, pose: np.ndarray, sigmas=PRIOR_SIGMAS):
        self.factors.append(Factor(i, -1, np.asarray(pose), np.asarray(sigmas)))

    def add_odometry(self, i: int, j: int, relative: np.ndarray, sigmas=ODOM_SIGMAS):
        self.factors.append(Factor(i, j, np.asarray(relative), np.asarray(sigmas)))

    def add_loop_closure(self, i: int, j: int, relative: np.ndarray, sigmas=LOOP_SIGMAS):
        self.factors.append(Factor(i, j, np.asarray(relative), np.asarray(sigmas)))

    def optimize(self, num_iters: int = 20) -> List[np.ndarray]:
        poses = jnp.asarray(np.stack(self.initial), dtype=jnp.float32)
        fi = jnp.asarray([f.i for f in self.factors], dtype=jnp.int32)
        fj = jnp.asarray([f.j for f in self.factors], dtype=jnp.int32)
        meas = jnp.asarray(np.stack([f.measurement for f in self.factors]), dtype=jnp.float32)
        weights = jnp.asarray(
            np.stack([1.0 / np.square(f.sigmas) for f in self.factors]), dtype=jnp.float32
        )
        out = _optimize(poses, fi, fj, meas, weights, num_iters=num_iters)
        self.initial = [np.asarray(p, dtype=np.float64) for p in out]
        return self.initial

    def get_poses(self) -> List[np.ndarray]:
        return list(self.initial)


class IncrementalPoseGraph:
    """API mirror of the reference `PoseGraphOptimizationGtsam`
    (`vfm_reg/pose_graph_optimization.py:10-115`): optimize-on-loop iSAM2
    behavior on the batched GN solver, warm-started and active-window-bounded.
    """

    def __init__(self, min_factors: int = 1):
        self.min_factors = min_factors
        self.vertex_ids: List[int] = []
        self.edges: List[tuple] = []
        self._initial: dict = {}  # vertex id -> [4, 4] initial estimate
        self._current: dict = {}  # vertex id -> [4, 4] optimized estimate
        self._factors: List[Factor] = []
        self._n_new_factors = 0
        self._new_min_vertex: int = None  # earliest vertex touched since last solve
        self.new_loops_count = 0

    # ------------------------------------------------------------- accessors
    def __len__(self) -> int:
        return self.size()

    def size(self) -> int:
        return len(self.vertex_ids)

    @property
    def poses(self) -> List[np.ndarray]:
        return [self.pose_at(i) for i in self.vertex_ids]

    def pose_at(self, vertex_id: int) -> np.ndarray:
        if vertex_id == -1:  # last vertex, like the reference
            vertex_id = self.vertex_ids[-1]
        if vertex_id in self._current:
            return self._current[vertex_id]
        # never optimized yet -> initial estimate (`pose_at`, `:48-57`)
        return self._initial[vertex_id]

    # --------------------------------------------------------------- factors
    def _touch(self, *vertex_ids):
        lo = min(vertex_ids)
        if self._new_min_vertex is None or lo < self._new_min_vertex:
            self._new_min_vertex = lo

    def add_prior_factor_pose(self, vertex_id: int, pose: np.ndarray,
                              sigmas=PRIOR_SIGMAS):
        pose = np.asarray(pose, dtype=np.float64)
        self._factors.append(Factor(vertex_id, -1, pose, np.asarray(sigmas)))
        self._initial[vertex_id] = pose
        self.vertex_ids.append(vertex_id)
        self._n_new_factors += 1
        self._touch(vertex_id)

    def add_odom_edge(self, vertex_id: int, measurement: np.ndarray,
                      sigma=ODOM_SIGMAS):
        """Chains from the LAST vertex; the new vertex's initial estimate is
        previous_pose @ measurement (`add_odom_edge`, `:100-108`)."""
        prev = self.vertex_ids[-1]
        measurement = np.asarray(measurement, dtype=np.float64)
        sig = np.full(6, sigma) if np.isscalar(sigma) else np.asarray(sigma)
        self._factors.append(Factor(prev, vertex_id, measurement, sig))
        self._initial[vertex_id] = self.pose_at(prev) @ measurement
        self.vertex_ids.append(vertex_id)
        self.edges.append((prev, vertex_id))
        self._n_new_factors += 1
        self._touch(prev, vertex_id)

    def add_loop_edge(self, vertex_id1: int, vertex_id2: int,
                      measurement: np.ndarray, sigma=LOOP_SIGMAS):
        measurement = np.asarray(measurement, dtype=np.float64)
        sig = np.full(6, sigma) if np.isscalar(sigma) else np.asarray(sigma)
        self._factors.append(Factor(vertex_id1, vertex_id2, measurement, sig))
        self.edges.append((vertex_id1, vertex_id2))
        self._n_new_factors += 1
        self.new_loops_count += 1
        self._touch(vertex_id1, vertex_id2)

    # ---------------------------------------------------------- optimization
    def optimize_if_needed(self) -> bool:
        """The reference policy (`optimize_if_needed`, `:59-72`): optimize
        immediately on a new loop, else batch when enough factors queued."""
        if self.new_loops_count == 1:
            self.optimize()
            return True
        if self._n_new_factors >= self.min_factors:
            self.optimize()
            self.new_loops_count = 0
            return True
        return False

    def optimize(self, num_iters: int = 20) -> None:
        # No new information since the last solve (the reference's post-loop
        # state: new_loops_count stays 1 so optimize_if_needed() calls here
        # every frame) -> the solution is already current. gtsam's equivalent
        # isam.update() with an empty factor graph is near-free; re-running
        # the full dense GN here would be an O(n^3) solve per frame for an
        # unchanged output.
        if self._current and self._n_new_factors == 0 and self._new_min_vertex is None:
            return
        order = {v: k for k, v in enumerate(self.vertex_ids)}
        poses0 = np.stack([self.pose_at(v) for v in self.vertex_ids])

        # Active window: everything downstream of the earliest vertex a new
        # factor touches (the sub-graph new information can influence in a
        # chain+loops topology); upstream stays frozen as gauge. First solve
        # (or an all-vertices touch) is a full batch — exactly iSAM2's
        # full-relinearization bootstrap.
        if self._new_min_vertex is None:
            active = np.ones(len(self.vertex_ids), dtype=bool)
        else:
            lo = order[self._new_min_vertex]
            active = np.arange(len(self.vertex_ids)) >= lo
            if not self._current:
                active[:] = True
        if active.all():
            active_arg = None
        else:
            active_arg = jnp.asarray(active)

        fi = jnp.asarray([order[f.i] for f in self._factors], dtype=jnp.int32)
        fj = jnp.asarray(
            [order[f.j] if f.j >= 0 else -1 for f in self._factors], dtype=jnp.int32
        )
        meas = jnp.asarray(np.stack([f.measurement for f in self._factors]), jnp.float32)
        weights = jnp.asarray(
            np.stack([1.0 / np.square(f.sigmas) for f in self._factors]), jnp.float32
        )
        out = _optimize(
            jnp.asarray(poses0, jnp.float32), fi, fj, meas, weights,
            active=active_arg, num_iters=num_iters,
        )
        out = np.asarray(out, dtype=np.float64)
        for k, v in enumerate(self.vertex_ids):
            self._current[v] = out[k]
        self._n_new_factors = 0
        self._new_min_vertex = None

"""Abaqus-convention UMAT material interface (host callback).

Equivalent of the reference's AbaqusUmatModel + userumat ABI
(src/mechanics_umat.{hpp,cpp}, src/userumat.h): user materials compiled to
a shared library with the standard UMAT signature are evaluated on the
host through ``jax.pure_callback`` — the reference likewise restricts
UMATs to CPU execution (README.md:35).

Kinematics mirror the reference's incremental treatment
(mechanics_umat.cpp:27-210, 309-578): the model tracks the beginning-step
deformation gradient per point, forms the incremental deformation gradient
from the velocity gradient, computes Eulerian log strain and its
increment, the incremental rotation (polar decomposition), and converts
between the framework's svec ordering [11,22,33,23,13,12] and Abaqus'
[11,22,33,12,13,23] (mechanics_umat.cpp:477-585).

The C ABI (matching userumat.h / Fortran UMAT):

  void umat(double* stress6, double* statev, double* ddsdde36,
            double* sse, double* spd, double* scd, double* rpl,
            double* ddsddt, double* drplde, double* drpldt,
            double* stran6, double* dstran6, double* time2, double* dtime,
            double* temp, double* dtemp, ..., double* props, int* nprops,
            ..., double* drot9, ..., double* dfgrd0, double* dfgrd1, ...)

Only the arguments the reference passes meaningfully are populated.
"""

from __future__ import annotations

import ctypes
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

# svec [11,22,33,23,13,12] <-> Abaqus [11,22,33,12,13,23]
_SVEC_TO_ABQ = np.array([0, 1, 2, 5, 4, 3])
_ABQ_TO_SVEC = np.array([0, 1, 2, 5, 4, 3])


def _polar_rotation(F):
    """Rotation factors of F (batched numpy, via SVD)."""
    U, _, Vt = np.linalg.svd(F)
    R = U @ Vt
    det = np.linalg.det(R)
    # guard reflections
    U[det < 0, :, -1] *= -1.0
    return U @ Vt


def _log_strain(F):
    """Eulerian log strain ln(V) from F (batched numpy, eigendecomp)."""
    B = F @ np.swapaxes(F, -1, -2)
    w, v = np.linalg.eigh(B)
    lw = 0.5 * np.log(np.maximum(w, 1e-300))
    return np.einsum("...ij,...j,...kj->...ik", v, lw, v)


class UmatLibrary:
    """ctypes binding of a shared library exporting ``umat_`` or ``umat``."""

    def __init__(self, path: str):
        self.lib = ctypes.CDLL(path)
        for name in ("umat_", "umat"):
            if hasattr(self.lib, name):
                self.fn = getattr(self.lib, name)
                break
        else:
            raise ValueError(f"{path} exports no umat symbol")
        self.fn.restype = None

    def call_batch(self, stress_abq, statev, stran, dstran, drot, dfgrd0,
                   dfgrd1, props, dtime, temp, char_len):
        """Loop points on the host (the reference does the same,
        mechanics_umat.cpp:408-578).  Returns (stress, statev, ddsdde)."""
        n = stress_abq.shape[0]
        nsv = statev.shape[1]
        npr = props.shape[0]
        ddsdde = np.zeros((n, 6, 6))
        c_d = ctypes.c_double
        c_i = ctypes.c_int
        zero = np.zeros(1)
        time2 = np.zeros(2)
        for i in range(n):
            sse = c_d(0.0)
            spd = c_d(0.0)
            scd = c_d(0.0)
            rpl = c_d(0.0)
            drpldt = c_d(0.0)
            pnewdt = c_d(10.0)
            dt_c = c_d(dtime)
            temp_c = c_d(temp)
            dtemp = c_d(0.0)
            ndi = c_i(3)
            nshr = c_i(3)
            ntens = c_i(6)
            nsv_c = c_i(nsv)
            npr_c = c_i(npr)
            noel = c_i(i + 1)
            npt = c_i(1)
            layer = c_i(0)
            kspt = c_i(0)
            kstep = c_i(1)
            kinc = c_i(1)
            celent = c_d(char_len[i])

            def ptr(a):
                return a.ctypes.data_as(ctypes.POINTER(c_d))

            dd = np.zeros((6, 6), order="F")
            coords = np.zeros(3)
            predef = np.zeros(1)
            dpred = np.zeros(1)
            cmname = ctypes.create_string_buffer(b"umat", 80)
            self.fn(
                ptr(stress_abq[i]), ptr(statev[i]), ptr(dd),
                ctypes.byref(sse), ctypes.byref(spd), ctypes.byref(scd),
                ctypes.byref(rpl), ptr(zero), ptr(zero),
                ctypes.byref(drpldt), ptr(stran[i]), ptr(dstran[i]),
                ptr(time2), ctypes.byref(dt_c), ctypes.byref(temp_c),
                ctypes.byref(dtemp), ptr(predef), ptr(dpred), cmname,
                ctypes.byref(ndi), ctypes.byref(nshr), ctypes.byref(ntens),
                ctypes.byref(nsv_c), ptr(props), ctypes.byref(npr_c),
                ptr(coords), ptr(np.asfortranarray(drot[i])),
                ctypes.byref(pnewdt), ctypes.byref(celent),
                ptr(np.asfortranarray(dfgrd0[i])),
                ptr(np.asfortranarray(dfgrd1[i])),
                ctypes.byref(noel), ctypes.byref(npt), ctypes.byref(layer),
                ctypes.byref(kspt), ctypes.byref(kstep), ctypes.byref(kinc),
            )
            ddsdde[i] = dd.T  # Fortran column-major -> row-major
        return stress_abq, statev, ddsdde


@dataclasses.dataclass(frozen=True)
class UmatModel:
    """UMAT-backed material for the FEM driver (ExaModel-equivalent).

    State layout per point: [F (9, column-major like the reference's
    kinVars0), stress svec (6), user statev (num_user_state)] -- carrying
    the stress in the state keeps the driver interface identical to the
    crystal models.
    """

    lib: UmatLibrary
    props: np.ndarray
    num_user_state: int
    temp_k: float = 298.0

    IND_F = 0

    @property
    def num_state(self):
        return 9 + 6 + self.num_user_state

    @property
    def qf_mapping(self):
        return {"def_grad": (0, 9), "stress": (9, 6),
                "statev": (15, self.num_user_state)}

    def init_state(self, quats_unused=None, npts=None):
        s = np.zeros((npts, self.num_state))
        s[:, 0] = s[:, 4] = s[:, 8] = 1.0  # F = I (column-major id)
        return s

    def model_setup(self, dt, vgrad, state_beg, compute_tangent=True,
                    nsub=None):  # nsub unused: UMATs handle their own subincrements
        npts = vgrad.shape[0]
        nsv = self.num_user_state

        def host_eval(args):
            vgrad_np, state_np, dt_np = (
                np.asarray(a, dtype=np.float64) for a in args)
            dt_v = float(dt_np)
            stress_np = state_np[:, 9:15]
            F0 = state_np[:, :9].reshape(npts, 3, 3).transpose(0, 2, 1)
            L = vgrad_np
            # incremental deformation gradient: Fhat = expm(L dt) ~ Pade
            I = np.eye(3)
            A = L * dt_v
            Fhat = np.linalg.solve(
                (I - 0.5 * A).reshape(npts, 3, 3),
                (I + 0.5 * A).reshape(npts, 3, 3))
            F1 = Fhat @ F0
            eps0 = _log_strain(F0)
            eps1 = _log_strain(F1)
            deps = eps1 - eps0
            drot = _polar_rotation(Fhat)

            def to_abq(t):  # tensor -> Abaqus 6-vector w/ eng shear
                return np.stack([t[..., 0, 0], t[..., 1, 1], t[..., 2, 2],
                                 2 * t[..., 0, 1], 2 * t[..., 0, 2],
                                 2 * t[..., 1, 2]], axis=-1)

            stress_abq = stress_np[:, _SVEC_TO_ABQ].copy()
            statev = np.ascontiguousarray(state_np[:, 15:])
            if statev.shape[1] == 0:
                statev = np.zeros((npts, 1))
            char_len = np.cbrt(np.abs(np.linalg.det(F1)))
            s_out, sv_out, dd = self.lib.call_batch(
                stress_abq, statev, to_abq(eps0), to_abq(deps), drot,
                F0, F1, np.asarray(self.props, dtype=np.float64), dt_v,
                self.temp_k, char_len)
            stress_new = s_out[:, _ABQ_TO_SVEC]
            # ddsdde: Abaqus row/col order -> svec order
            dd = dd[:, _ABQ_TO_SVEC][:, :, _ABQ_TO_SVEC]
            state_new = np.concatenate(
                [F1.transpose(0, 2, 1).reshape(npts, 9), stress_new,
                 sv_out[:, :self.num_user_state]], axis=1)
            return (stress_new.astype(np.float64),
                    state_new.astype(np.float64), dd.astype(np.float64))

        out_shapes = (
            jax.ShapeDtypeStruct((npts, 6), jnp.float64),
            jax.ShapeDtypeStruct((npts, self.num_state), jnp.float64),
            jax.ShapeDtypeStruct((npts, 6, 6), jnp.float64),
        )
        stress, state_new, dd = jax.pure_callback(
            host_eval, out_shapes, (vgrad, state_beg, dt))
        return stress, state_new, dd

    def dp_mat(self, state):
        return jnp.zeros((state.shape[0], 3, 3))

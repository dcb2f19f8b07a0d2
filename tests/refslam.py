"""ctypes wrapper around native/librefslam.so — the ACTUAL reference C++
orchestration (monoslam.cpp GoOneStep + kalman.cpp + feature.cpp) compiled
headless behind stub Pangolin/graphics headers (native/refbuild/).

Used by tests/test_cross_native_e2e.py to replay frame sequences through the
real reference and compare end-to-end against the JAX pipeline. Test-only.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

NATIVE_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "native"))
LIB_PATH = os.path.join(NATIVE_DIR, "librefslam.so")
REF = "/root/reference/scenelib2"

F64 = ctypes.POINTER(ctypes.c_double)
U8 = ctypes.POINTER(ctypes.c_ubyte)
I32 = ctypes.POINTER(ctypes.c_int)


def build_lib() -> str | None:
    """Build librefslam.so if needed; returns the path or None on failure."""
    if not os.path.isdir(REF):
        return None
    if not os.path.exists(LIB_PATH):
        r = subprocess.run(
            ["make", "-C", NATIVE_DIR, "refslam"], capture_output=True, text=True
        )
        if r.returncode != 0 or not os.path.exists(LIB_PATH):
            return None
    return LIB_PATH


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(F64)


class RefSlam:
    """One headless reference MonoSLAM instance (owns a C++ MonoSLAM)."""

    def __init__(self, cfg_path: str):
        path = build_lib()
        if path is None:
            raise RuntimeError("librefslam.so unavailable")
        self.lib = ctypes.CDLL(path)
        self.lib.rs_create.restype = ctypes.c_void_p
        self.lib.rs_create.argtypes = [ctypes.c_char_p]
        self.lib.rs_destroy.argtypes = [ctypes.c_void_p]
        for name, argtypes, restype in [
            ("rs_go_one_step", [ctypes.c_void_p, U8, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int], ctypes.c_int),
            ("rs_total_state_size", [ctypes.c_void_p], ctypes.c_int),
            ("rs_get_xv", [ctypes.c_void_p, F64], None),
            ("rs_get_pxx", [ctypes.c_void_p, F64], None),
            ("rs_get_total_state", [ctypes.c_void_p, F64], None),
            ("rs_get_total_cov", [ctypes.c_void_p, F64], None),
            ("rs_num_features", [ctypes.c_void_p], ctypes.c_int),
            ("rs_num_partial", [ctypes.c_void_p], ctypes.c_int),
            ("rs_next_free_label", [ctypes.c_void_p], ctypes.c_int),
            ("rs_successful_measurement_vector_size", [ctypes.c_void_p], ctypes.c_int),
            ("rs_number_of_visible_features", [ctypes.c_void_p], ctypes.c_int),
            ("rs_feature_info", [ctypes.c_void_p, ctypes.c_int, I32, I32, I32,
                                 I32, I32, I32, F64, F64, F64], None),
            ("rs_feature_patch", [ctypes.c_void_p, ctypes.c_int, U8, ctypes.c_int], None),
            ("rs_partial_info", [ctypes.c_void_p, ctypes.c_int, I32, I32, F64,
                                 F64, F64, F64, ctypes.c_int], ctypes.c_int),
            ("rs_init_search_region", [ctypes.c_void_p, I32, I32, I32, I32], ctypes.c_int),
            ("rs_initialise_feature", [ctypes.c_void_p, U8, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, ctypes.c_int], None),
            ("rs_initialise_auto_feature", [ctypes.c_void_p, U8, ctypes.c_int,
                                            ctypes.c_int], None),
            ("rs_add_new_known_feature", [ctypes.c_void_p, F64, F64,
                                          ctypes.c_char_p], None),
        ]:
            fn = getattr(self.lib, name)
            fn.argtypes = argtypes
            fn.restype = restype
        self.h = self.lib.rs_create(cfg_path.encode())

    def close(self):
        if self.h:
            self.lib.rs_destroy(self.h)
            self.h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # ------------------------------------------------------------- stepping

    def go_one_step(self, frame: np.ndarray, save_trajectory=True,
                    enable_mapping=True) -> bool:
        frame = np.ascontiguousarray(frame, np.uint8)
        return bool(
            self.lib.rs_go_one_step(
                self.h, frame.ctypes.data_as(U8), frame.shape[0], frame.shape[1],
                int(save_trajectory), int(enable_mapping),
            )
        )

    def initialise_feature(self, frame: np.ndarray, uu: int, vv: int) -> None:
        """Manual init at a picked pixel (reference InitialiseFeature)."""
        frame = np.ascontiguousarray(frame, np.uint8)
        self.lib.rs_initialise_feature(
            self.h, frame.ctypes.data_as(U8), frame.shape[0], frame.shape[1],
            int(uu), int(vv),
        )

    def initialise_auto_feature(self, frame: np.ndarray) -> None:
        """Manual auto-init trigger (reference InitialiseAutoFeature)."""
        frame = np.ascontiguousarray(frame, np.uint8)
        self.lib.rs_initialise_auto_feature(
            self.h, frame.ctypes.data_as(U8), frame.shape[0], frame.shape[1]
        )

    def add_new_known_feature(self, y, xp_org, patch_path: str) -> None:
        """Reference AddNewKnownFeature (monoslam.cpp:1278-1291)."""
        y = np.ascontiguousarray(y, np.float64)
        xp = np.ascontiguousarray(xp_org, np.float64)
        self.lib.rs_add_new_known_feature(
            self.h, _dptr(y), _dptr(xp), str(patch_path).encode()
        )

    # --------------------------------------------------------- introspection

    @property
    def total_state_size(self) -> int:
        return self.lib.rs_total_state_size(self.h)

    @property
    def xv(self) -> np.ndarray:
        out = np.zeros(13)
        self.lib.rs_get_xv(self.h, _dptr(out))
        return out

    @property
    def pxx(self) -> np.ndarray:
        out = np.zeros((13, 13))
        self.lib.rs_get_pxx(self.h, _dptr(out))
        return out

    def total_state(self) -> np.ndarray:
        out = np.zeros(self.total_state_size)
        self.lib.rs_get_total_state(self.h, _dptr(out))
        return out

    def total_cov(self) -> np.ndarray:
        d = self.total_state_size
        out = np.zeros((d, d))
        self.lib.rs_get_total_cov(self.h, _dptr(out))
        return out

    @property
    def n_features(self) -> int:
        return self.lib.rs_num_features(self.h)

    @property
    def n_partial(self) -> int:
        return self.lib.rs_num_partial(self.h)

    @property
    def next_free_label(self) -> int:
        return self.lib.rs_next_free_label(self.h)

    @property
    def n_matched(self) -> int:
        """Features successfully measured in the last update (pairs)."""
        return self.lib.rs_successful_measurement_vector_size(self.h) // 2

    @property
    def n_visible(self) -> int:
        return self.lib.rs_number_of_visible_features(self.h)

    def features(self) -> list[dict]:
        out = []
        for i in range(self.n_features):
            label = ctypes.c_int()
            full = ctypes.c_int()
            att = ctypes.c_int()
            suc = ctypes.c_int()
            sel = ctypes.c_int()
            okf = ctypes.c_int()
            y6 = np.zeros(6)
            h2 = np.zeros(2)
            z2 = np.zeros(2)
            self.lib.rs_feature_info(
                self.h, i, ctypes.byref(label), ctypes.byref(full),
                ctypes.byref(att), ctypes.byref(suc), ctypes.byref(sel),
                ctypes.byref(okf), _dptr(y6), _dptr(h2), _dptr(z2),
            )
            out.append(
                dict(
                    label=label.value,
                    fully_initialised=bool(full.value),
                    attempts=att.value,
                    successes=suc.value,
                    selected=bool(sel.value),
                    successful=bool(okf.value),
                    y=y6[: 3 if full.value else 6].copy(),
                    h=h2.copy(),
                    z=z2.copy(),
                )
            )
        return out

    def feature_patch(self, i: int, boxsize: int = 11) -> np.ndarray:
        out = np.zeros((boxsize, boxsize), np.uint8)
        self.lib.rs_feature_patch(self.h, i, out.ctypes.data_as(U8), boxsize)
        return out

    def partials(self, cap: int = 256) -> list[dict]:
        out = []
        for i in range(self.n_partial):
            label = ctypes.c_int()
            att = ctypes.c_int()
            mean = ctypes.c_double()
            cov = ctypes.c_double()
            lam = np.zeros(cap)
            prob = np.zeros(cap)
            n = self.lib.rs_partial_info(
                self.h, i, ctypes.byref(label), ctypes.byref(att),
                ctypes.byref(mean), ctypes.byref(cov), _dptr(lam), _dptr(prob), cap,
            )
            out.append(
                dict(
                    label=label.value,
                    match_attempts=att.value,
                    mean=mean.value,
                    cov=cov.value,
                    lambdas=lam[:n].copy(),
                    probs=prob[:n].copy(),
                )
            )
        return out

    def init_search_region(self):
        u0 = ctypes.c_int()
        v0 = ctypes.c_int()
        u1 = ctypes.c_int()
        v1 = ctypes.c_int()
        flag = self.lib.rs_init_search_region(
            self.h, ctypes.byref(u0), ctypes.byref(v0), ctypes.byref(u1),
            ctypes.byref(v1),
        )
        return bool(flag), (u0.value, v0.value, u1.value, v1.value)

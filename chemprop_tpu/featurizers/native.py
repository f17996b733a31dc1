"""ctypes bindings for the native C++ batch featurizer (csrc/featurizer.cpp)
— the cuik-molmaker equivalent (reference ``featurizers/molgraph/molecule.py:
127-257``): one call featurizes a whole SMILES list into pre-batched arrays.

The shared library is built on demand with g++ if missing; outputs are
bit-identical to the Python featurizer path (see tests/unit/featurizers/
test_native.py).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import NamedTuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_DIR = Path(__file__).parent / "_native"
_LIB_PATH = _LIB_DIR / "libcptpu_featurizer.so"
_SRC_PATH = Path(__file__).parents[2] / "csrc" / "featurizer.cpp"

_lib = None


class NativeBatch(NamedTuple):
    V: np.ndarray  # [n_atoms, 72] float32
    E: np.ndarray  # [n_edges, 14] float32
    src: np.ndarray  # [n_edges] int32
    dst: np.ndarray
    rev: np.ndarray
    batch: np.ndarray  # [n_atoms] int32 (mol index)
    atom_offsets: np.ndarray  # [n_mols + 1]
    edge_offsets: np.ndarray  # [n_mols + 1]


def _build_library() -> None:
    _LIB_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC_PATH), "-o", str(_LIB_PATH),
    ]
    logger.info("building native featurizer: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or (
        _SRC_PATH.exists() and _SRC_PATH.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        _build_library()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.cptpu_featurize_batch.restype = ctypes.c_void_p
    lib.cptpu_featurize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
    ]
    lib.cptpu_featurize_rxn_batch.restype = ctypes.c_void_p
    lib.cptpu_featurize_rxn_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    for name in ("cptpu_atom_fdim", "cptpu_bond_fdim"):
        getattr(lib, name).argtypes = [ctypes.c_void_p]
        getattr(lib, name).restype = ctypes.c_int
    lib.cptpu_error_index.argtypes = [ctypes.c_void_p]
    lib.cptpu_error_msg.argtypes = [ctypes.c_void_p]
    lib.cptpu_error_msg.restype = ctypes.c_char_p
    for name in ("cptpu_n_atoms", "cptpu_n_edges"):
        getattr(lib, name).argtypes = [ctypes.c_void_p]
        getattr(lib, name).restype = ctypes.c_int64
    for name in ("cptpu_V", "cptpu_E"):
        getattr(lib, name).argtypes = [ctypes.c_void_p]
        getattr(lib, name).restype = ctypes.POINTER(ctypes.c_float)
    for name in (
        "cptpu_src", "cptpu_dst", "cptpu_rev", "cptpu_batch",
        "cptpu_atom_offsets", "cptpu_edge_offsets",
    ):
        getattr(lib, name).argtypes = [ctypes.c_void_p]
        getattr(lib, name).restype = ctypes.POINTER(ctypes.c_int32)
    lib.cptpu_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception as e:  # noqa: BLE001 - availability probe
        logger.warning("native featurizer unavailable: %s", e)
        return False


def _batch_from_handle(lib, h, n_mols: int, inputs: list[str]) -> NativeBatch:
    err_idx = lib.cptpu_error_index(h)
    if err_idx >= 0:
        msg = lib.cptpu_error_msg(h).decode()
        raise ValueError(f"failed to parse {inputs[err_idx]!r}: {msg}")
    n_atoms = lib.cptpu_n_atoms(h)
    n_edges = lib.cptpu_n_edges(h)
    d_v = lib.cptpu_atom_fdim(h)
    d_e = lib.cptpu_bond_fdim(h)

    def copy(ptr, shape, dtype):
        n = int(np.prod(shape))
        if n == 0:
            return np.zeros(shape, dtype=dtype)
        # string_at is a plain memcpy; avoids ctypes' O(n) giant-array-type
        # construction which dwarfs the featurization itself
        raw = ctypes.string_at(ptr, n * np.dtype(dtype).itemsize)
        return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()

    return NativeBatch(
        V=copy(lib.cptpu_V(h), (n_atoms, d_v), np.float32),
        E=copy(lib.cptpu_E(h), (n_edges, d_e), np.float32),
        src=copy(lib.cptpu_src(h), (n_edges,), np.int32),
        dst=copy(lib.cptpu_dst(h), (n_edges,), np.int32),
        rev=copy(lib.cptpu_rev(h), (n_edges,), np.int32),
        batch=copy(lib.cptpu_batch(h), (n_atoms,), np.int32),
        atom_offsets=copy(lib.cptpu_atom_offsets(h), (n_mols + 1,), np.int32),
        edge_offsets=copy(lib.cptpu_edge_offsets(h), (n_mols + 1,), np.int32),
    )


def featurize_batch_native(smiles: list[str], keep_h: bool = False) -> NativeBatch:
    """Batch SMILES -> featurized arrays (V2 atom mode), entirely in C++."""
    lib = _load()
    arr = (ctypes.c_char_p * len(smiles))(*[s.encode() for s in smiles])
    h = lib.cptpu_featurize_batch(arr, len(smiles), int(keep_h))
    try:
        return _batch_from_handle(lib, h, len(smiles), smiles)
    finally:
        lib.cptpu_free(h)


# RxnMode name -> C++ mode code (kind*2 + balanced)
_RXN_MODES = {
    "REAC_PROD": 0, "REAC_PROD_BALANCE": 1,
    "REAC_DIFF": 2, "REAC_DIFF_BALANCE": 3,
    "PROD_DIFF": 4, "PROD_DIFF_BALANCE": 5,
}


def featurize_rxn_batch_native(
    rxns: list[str], keep_h: bool = False, mode: str = "REAC_DIFF"
) -> NativeBatch:
    """Batch reaction SMILES ("rct>agents>pdt") -> CGR-featurized arrays,
    entirely in C++ (the cuik ``batch_reaction_featurizer`` equivalent,
    reference ``featurizers/molgraph/reaction.py:338-470``)."""
    lib = _load()
    code = _RXN_MODES[str(mode).upper().replace("-", "_")]
    arr = (ctypes.c_char_p * len(rxns))(*[s.encode() for s in rxns])
    h = lib.cptpu_featurize_rxn_batch(arr, len(rxns), int(keep_h), code)
    try:
        return _batch_from_handle(lib, h, len(rxns), rxns)
    finally:
        lib.cptpu_free(h)


def molgraphs_from_native(nb: NativeBatch) -> list:
    """Split a NativeBatch back into per-molecule MolGraphs (drop-in for the
    Python featurize path / MolGraph caches)."""
    from chemprop_tpu.types import MolGraph

    out = []
    for m in range(len(nb.atom_offsets) - 1):
        a0, a1 = int(nb.atom_offsets[m]), int(nb.atom_offsets[m + 1])
        e0, e1 = int(nb.edge_offsets[m]), int(nb.edge_offsets[m + 1])
        out.append(
            MolGraph(
                V=nb.V[a0:a1],
                E=nb.E[e0:e1],
                edge_index=np.stack([nb.src[e0:e1] - a0, nb.dst[e0:e1] - a0]),
                rev_edge_index=nb.rev[e0:e1] - e0,
            )
        )
    return out


class CuikmolmakerMolGraphFeaturizer:
    """Batch SMILES-list featurizer, API-compatible with the reference's
    cuik-molmaker wrapper (``featurizers/molgraph/molecule.py:127-257``):
    one call featurizes the whole list in C++ and returns the pre-batched
    arrays (:class:`NativeBatch` = the BatchCuikMolGraph equivalent)."""

    def __init__(self, keep_h: bool = False):
        self.keep_h = keep_h

    def __call__(self, smiles: list[str]) -> NativeBatch:
        return featurize_batch_native(smiles, keep_h=self.keep_h)


class CuikmolmakerCGRFeaturizer:
    """Batch reaction-SMILES CGR featurizer over the C++ path (the cuik
    ``batch_reaction_featurizer`` equivalent, reference
    ``featurizers/molgraph/reaction.py:338-470``)."""

    def __init__(self, mode: str = "REAC_DIFF", keep_h: bool = False):
        self.mode = mode
        self.keep_h = keep_h

    def __call__(self, rxns: list[str]) -> NativeBatch:
        return featurize_rxn_batch_native(rxns, keep_h=self.keep_h, mode=self.mode)


# reference-compatible name for the pre-batched container
BatchCuikMolGraph = NativeBatch

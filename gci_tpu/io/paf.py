"""PAF ingestion -> packed columns.

Column contract (reference: GCI.py:218-229): query name, query length,
query start/end, target name, target start/end, num matching residues,
alignment block length, mapq (PAF standard columns 1-12; columns 5 and 7
unused by the cascade).  Extension/optional fields are ignored.
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass

import numpy as np

from gci_tpu.io.names import hash_names


@dataclass
class PafData:
    names: list[bytes]
    name_keys: np.ndarray  # (n, 2) uint64
    targets: list[str]
    qlen: np.ndarray
    qstart: np.ndarray
    qend: np.ndarray
    tstart: np.ndarray
    tend: np.ndarray
    nmatch: np.ndarray
    alnlen: np.ndarray
    mapq: np.ndarray

    @property
    def n_records(self) -> int:
        return len(self.names)


def read_paf(path: str, threads: int = 2) -> PafData:
    """Parse a PAF file (native C++ fast path, Python fallback)."""
    try:
        from gci_tpu.native import NativePaf

        np_ = NativePaf(path, nthreads=threads)
        ints = np_.ints
        return PafData(
            names=np_.names,
            name_keys=np.stack([np_.name_hash, np_.name_hash2], axis=1),
            targets=np_.targets,
            qlen=ints[:, 0],
            qstart=ints[:, 1],
            qend=ints[:, 2],
            tstart=ints[:, 3],
            tend=ints[:, 4],
            nmatch=ints[:, 5],
            alnlen=ints[:, 6],
            mapq=ints[:, 7],
        )
    except (ImportError, OSError):
        return _read_paf_python(path)


def _read_paf_python(path: str) -> PafData:
    names: list[bytes] = []
    targets: list[str] = []
    ints: list[tuple[int, int, int, int, int, int, int, int]] = []
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        for line in f:
            p = line.rstrip(b"\r\n").split(b"\t")
            if len(p) < 12:
                continue
            names.append(p[0])
            targets.append(p[5].decode())
            ints.append(
                (
                    int(p[1]), int(p[2]), int(p[3]),
                    int(p[7]), int(p[8]), int(p[9]), int(p[10]), int(p[11]),
                )
            )
    arr = np.array(ints, dtype=np.int64).reshape(-1, 8)
    return PafData(
        names=names,
        name_keys=hash_names(names),
        targets=targets,
        qlen=arr[:, 0],
        qstart=arr[:, 1],
        qend=arr[:, 2],
        tstart=arr[:, 3],
        tend=arr[:, 4],
        nmatch=arr[:, 5],
        alnlen=arr[:, 6],
        mapq=arr[:, 7],
    )

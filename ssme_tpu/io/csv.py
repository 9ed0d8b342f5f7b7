"""Headerless CSV data loading + posterior-sample reuse.

Replaces the reference's ``utils::read_data`` (``include/ssme/utils.h:
25-64``) and ``utils::csv_param_sampler`` (``utils.h:75-141``).

A native C++ fast path (``ssme_tpu.native``) parses large CSVs without the
Python interpreter in the loop; it falls back to numpy transparently when
the shared library is unavailable.
"""

from __future__ import annotations

import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssme_tpu.native import native_read_csv


def read_data(path: str, num_cols: Optional[int] = None,
              dtype=np.float32) -> np.ndarray:
    """Read a headerless comma-separated file into a (T, num_cols) array.

    ``utils::read_data<nc>`` semantics (``utils.h:25-64``): row-wise parse;
    malformed rows are reported to stderr and skipped rather than raising
    (``utils.h:37,53-56``).
    """
    arr = native_read_csv(path)
    if arr is None:
        rows = []
        with open(path, "r") as f:
            for line_num, line in enumerate(f):
                line = line.strip()
                if not line:
                    continue
                try:
                    rows.append([float(tok) for tok in line.split(",")])
                except ValueError:
                    print(f"error parsing line {line_num} of {path}",
                          file=sys.stderr)
        if not rows:
            print(f"could not read in data from {path}", file=sys.stderr)
            return np.zeros((0, num_cols or 1), dtype=dtype)
        width = len(rows[0])
        rows = [r for r in rows if len(r) == width]
        arr = np.asarray(rows, dtype=dtype)
    else:
        arr = arr.astype(dtype, copy=False)
    if num_cols is not None and arr.shape[1] != num_cols:
        raise ValueError(
            f"{path}: expected {num_cols} columns, found {arr.shape[1]}")
    return arr


def read_params_csv(path: str, dim_param: Optional[int] = None) -> np.ndarray:
    """Posterior parameter samples from CSV — the data source of
    ``csv_param_sampler`` (``utils.h:75-141``)."""
    return read_data(path, num_cols=dim_param)


class ParamSampler:
    """Uniformly-at-random draws from stored posterior samples.

    ``utils::csv_param_sampler`` (``utils.h:75-141``): ``samp()`` draws one
    row uniformly (``utils.h:137-141``); seeded via jax PRNG keys instead
    of clock-seeded mt19937 (``utils.h:118-134``).
    """

    def __init__(self, path_or_array, dim_param: Optional[int] = None):
        if isinstance(path_or_array, (str, bytes)):
            self.samples = jnp.asarray(read_params_csv(path_or_array, dim_param))
        else:
            self.samples = jnp.asarray(path_or_array)
        if self.samples.ndim != 2 or self.samples.shape[0] == 0:
            raise ValueError("parameter samples must be a nonempty (M, d) array")

    def samp(self, key, num: Optional[int] = None) -> jnp.ndarray:
        shape = () if num is None else (num,)
        idx = jax.random.randint(key, shape, 0, self.samples.shape[0])
        return jnp.take(self.samples, idx, axis=0)


__all__ = ["read_data", "read_params_csv", "ParamSampler"]

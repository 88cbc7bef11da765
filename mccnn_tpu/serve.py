"""Model export + serving bundles.

Beyond-reference capability (SURVEY §2 notes viscom-ulm/MCCNN ships only
training/eval scripts; deployment means re-running the TF1 graph from the
original checkout). Here a trained model exports to a **self-contained,
versioned StableHLO artifact** via ``jax.export``: the serialized program
embeds the parameters as constants, records the lowering platforms, and
type-checks its inputs at call time — no model code, flax, or checkpoint
needed at serving time, only a JAX runtime.

TPU-native serving stance: artifacts are **static-shape** (one (batch,
points) signature per bundle, like every compiled TPU program); the loader
pads smaller request batches up to the exported batch and slices results
back, so a serving frontend never triggers a recompile.

Backend capture: the conv backend is frozen at export-trace time
(``ops/dispatch.py``). Exporting on TPU captures the fused Pallas kernels
(Mosaic custom calls — TPU-only artifacts); exporting with
``MCCNN_TPU_CONV_BACKEND=jnp`` (or on CPU) captures the portable XLA path,
which may target several platforms at once (``platforms=("cpu", "tpu")``).
"""

from __future__ import annotations

import io
import json
import time
import zipfile
from typing import Any

import jax
import numpy as np
from jax import export as jax_export

from .train.state import _model_args

FORMAT_VERSION = 1
_EXPORT_MEMBER = "predict.jaxexport"
_MANIFEST_MEMBER = "manifest.json"


def make_predict_fn(model, params, batch_stats):
    """Inference closure over frozen variables: ``fn(batch) -> outputs``.

    ``batch`` follows the zoo-wide positional contract of
    ``train.state._model_args`` (points, mask[, features][, category_onehot]).
    """

    def predict(batch: dict):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            *_model_args(batch),
            train=False,
        )

    return predict


def export_predict(
    model,
    params,
    batch_stats,
    example_batch: dict,
    *,
    platforms: tuple[str, ...] | None = None,
) -> jax_export.Exported:
    """Trace + lower the inference fn for ``example_batch``'s shapes/dtypes."""
    predict = make_predict_fn(model, params, batch_stats)
    return jax_export.export(jax.jit(predict), platforms=platforms)(
        example_batch
    )


def save_bundle(
    path: str,
    exported: jax_export.Exported | list[jax_export.Exported],
    *,
    manifest: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Write a ``.mcb`` bundle: zip(manifest.json, predict*.jaxexport).

    A LIST of exports (same model, different batch sizes) writes a
    **bucketed-batch bundle** — the static-shape TPU serving pattern
    (``allowed_batch_sizes``): the loader routes each request to the
    smallest program whose batch fits, bounding padding waste to the
    bucket spacing instead of the largest batch.
    """
    exports = exported if isinstance(exported, list) else [exported]
    exports = sorted(exports, key=lambda e: int(e.in_avals[0].shape[0]))
    man = dict(manifest or {})
    man.setdefault("format_version", FORMAT_VERSION)
    man.setdefault("created_unix", int(time.time()))
    man["jax_version"] = jax.__version__
    man["platforms"] = sorted({p for e in exports for p in e.platforms})
    man["input_spec"] = {
        "tree": str(exports[-1].in_tree),
        "avals": [str(a) for a in exports[-1].in_avals],
    }
    man["output_spec"] = [str(a) for a in exports[-1].out_avals]
    if len(exports) > 1:
        man["programs"] = [
            {
                "member": f"predict_{i}.jaxexport",
                "batch": int(e.in_avals[0].shape[0]),
            }
            for i, e in enumerate(exports)
        ]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST_MEMBER, json.dumps(man, indent=2, sort_keys=True))
        if len(exports) == 1:
            zf.writestr(_EXPORT_MEMBER, bytes(exports[0].serialize()))
        else:
            for spec, e in zip(man["programs"], exports):
                zf.writestr(spec["member"], bytes(e.serialize()))
    return man


class LoadedBundle:
    """A deserialized bundle, callable on any batch size <= the largest
    exported one.

    ``predict`` routes the request to the smallest exported program whose
    batch fits (one program in the common case; the bucketed-batch ladder
    when the bundle was saved with several), pads the leading axis of every
    batch entry up to that program's batch (repeating row 0 — all entries
    share the leading batch axis by the zoo contract), and slices outputs
    back — variable-size serving traffic never triggers a recompile.
    """

    def __init__(self, manifest: dict, exports: list[jax_export.Exported]):
        exports = sorted(exports, key=lambda e: int(e.in_avals[0].shape[0]))
        self.manifest = manifest
        self.exported = exports[-1]  # largest signature (back-compat alias)
        self._programs = [
            (int(e.in_avals[0].shape[0]), jax.jit(e.call)) for e in exports
        ]
        self.batch_sizes = [b for b, _ in self._programs]
        self.batch_size = self.batch_sizes[-1]

    def predict(self, batch: dict):
        b = int(next(iter(batch.values())).shape[0])
        if b > self.batch_size:
            raise ValueError(
                f"request batch {b} exceeds the exported batch "
                f"{self.batch_size}; split the request or re-export"
            )
        target, call = next(
            (bs, c) for bs, c in self._programs if bs >= b
        )
        if b < target:
            pad = target - b
            batch = {
                k: np.concatenate(
                    [np.asarray(v), np.repeat(np.asarray(v)[:1], pad, axis=0)]
                )
                for k, v in batch.items()
            }
        out = call(batch)
        return jax.tree.map(lambda x: x[:b], out)

    # The raw exact-shape entry point (no padding), e.g. for benchmarking.
    def __call__(self, batch: dict):
        b = int(next(iter(batch.values())).shape[0])
        for bs, call in self._programs:
            if bs == b:
                return call(batch)
        raise ValueError(
            f"no exported program with batch {b} (have {self.batch_sizes}); "
            "use predict() for padded routing"
        )


def load_bundle(path: str, *, cache_dir: str | None = None) -> LoadedBundle:
    """Load a ``.mcb`` bundle.

    ``cache_dir`` enables JAX's persistent compilation cache (process-wide)
    before the program is first compiled: a deserialized program recompiles
    its StableHLO (including Mosaic custom calls) from scratch in a fresh
    process — minutes on TPU — so a serving frontend that restarts should
    always point this at a durable directory to make reloads near-instant.
    """
    if cache_dir is not None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Serving bundles are small single programs: always worth caching.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    with zipfile.ZipFile(path, "r") as zf:
        manifest = json.loads(zf.read(_MANIFEST_MEMBER))
        # Forward-compat check BEFORE touching program members (a newer
        # format may rename/restructure them).
        if manifest.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"bundle format {manifest['format_version']} is newer than "
                f"this library ({FORMAT_VERSION})"
            )
        members = [
            spec["member"] for spec in manifest.get("programs", ())
        ] or [_EXPORT_MEMBER]
        blobs = [zf.read(m) for m in members]
    return LoadedBundle(
        manifest, [jax_export.deserialize(bytearray(b)) for b in blobs]
    )


def bundle_info(path: str) -> dict:
    """Manifest without deserializing the program (cheap inspection)."""
    with zipfile.ZipFile(path, "r") as zf:
        return json.loads(zf.read(_MANIFEST_MEMBER))


__all__ = [
    "FORMAT_VERSION",
    "LoadedBundle",
    "bundle_info",
    "export_predict",
    "load_bundle",
    "make_predict_fn",
    "save_bundle",
]

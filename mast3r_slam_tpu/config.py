"""YAML config system with ``inherit:`` chaining.

Keeps the reference's config semantics (/root/reference/mast3r_slam/config.py:
yaml + recursive parent merge + scientific-notation floats) but instead of a
mutable module-global dict, ``load_config`` returns an immutable mapping and
``make_*`` helpers derive the typed, hashable NamedTuple configs the jitted
stages take as static arguments (mutable global config and jit don't mix).
"""

from __future__ import annotations

import copy
import pathlib
import re

import yaml

from .slam.ba import BAConfig
from .slam.factor_graph import FactorGraphConfig, MatchingConfig
from .slam.retrieval import RetrievalConfig
from .slam.tracker import TrackerConfig

_FLOAT_RE = re.compile(
    """^(?:
        [-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*
        |[-+]?\\.(?:inf|Inf|INF)
        |\\.(?:nan|NaN|NAN))$""",
    re.X,
)


def _loader():
    loader = yaml.SafeLoader
    loader.add_implicit_resolver(
        "tag:yaml.org,2002:float", _FLOAT_RE, list("-+0123456789.")
    )
    return loader


def _merge(parent: dict, child: dict) -> dict:
    out = copy.deepcopy(parent)
    for k, v in child.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def _resolve(path) -> pathlib.Path:
    """Resolve a config path: as given (cwd/absolute), else the preset of
    the same name shipped INSIDE the package (`mast3r_slam_tpu/configs/`,
    kept byte-identical to the repo-root `configs/` by a test) — so the
    installed console script works from any directory."""
    p = pathlib.Path(path)
    if p.exists():
        return p
    packaged = pathlib.Path(__file__).resolve().parent / "configs" / p.name
    if packaged.exists():
        return packaged
    return p   # let open() raise the natural FileNotFoundError


def load_config(path) -> dict:
    """Load a YAML config, following ``inherit:`` parent chains."""
    path = _resolve(path)
    with open(path, "r") as f:
        cfg = yaml.load(f, Loader=_loader()) or {}
    inherit = cfg.pop("inherit", None)
    if inherit is not None:
        parent_path = pathlib.Path(inherit)
        if not parent_path.is_absolute() and not parent_path.exists():
            parent_path = path.parent / parent_path.name
        cfg = _merge(load_config(parent_path), cfg)
    return cfg


def default_config() -> dict:
    """Built-in defaults mirroring config/base.yaml of the reference."""
    repo = pathlib.Path(__file__).resolve().parent.parent / "configs" / "base.yaml"
    return load_config(repo if repo.exists() else "configs/base.yaml")


# -- typed config derivation -------------------------------------------------


def make_tracker_config(cfg: dict) -> TrackerConfig:
    t = cfg["tracking"]
    return TrackerConfig(
        max_iters=int(t["max_iters"]), C_conf=float(t["C_conf"]),
        Q_conf=float(t["Q_conf"]), rel_error=float(t["rel_error"]),
        delta_norm=float(t["delta_norm"]), huber=float(t["huber"]),
        min_match_frac=float(t["min_match_frac"]),
        match_frac_thresh=float(t["match_frac_thresh"]),
        kf_every=int(t.get("kf_every", 0)),
        sigma_ray=float(t["sigma_ray"]), sigma_dist=float(t["sigma_dist"]),
        sigma_pixel=float(t["sigma_pixel"]), sigma_depth=float(t["sigma_depth"]),
        pixel_border=int(t["pixel_border"]), depth_eps=float(t["depth_eps"]),
    )


def make_ba_config(cfg: dict, point_chunk: int = 8192) -> BAConfig:
    o = cfg["local_opt"]
    return BAConfig(
        pin=int(o["pin"]), max_iters=int(o["max_iters"]),
        C_conf=float(o["C_conf"]), Q_conf=float(o["Q_conf"]),
        sigma_ray=float(o["sigma_ray"]), sigma_dist=float(o["sigma_dist"]),
        sigma_pixel=float(o["sigma_pixel"]), sigma_depth=float(o["sigma_depth"]),
        delta_norm=float(o["delta_norm"]), pixel_border=int(o["pixel_border"]),
        depth_eps=float(o["depth_eps"]), point_chunk=point_chunk,
        solver=str(o.get("solver", "fp32")),
        point_stride=int(o.get("point_stride", 1)),
    )


def make_matching_config(cfg: dict) -> MatchingConfig:
    m = cfg["matching"]
    return MatchingConfig(
        max_iter=int(m["max_iter"]), lambda_init=float(m["lambda_init"]),
        convergence_thresh=float(m["convergence_thresh"]),
        dist_thresh=float(m["dist_thresh"]), radius=int(m["radius"]),
        dilation_max=int(m["dilation_max"]),
        subpixel=bool(m.get("subpixel", False)),
        coarse_iter=int(m.get("coarse_iter", 0)),
        separable_refine=bool(m.get("separable_refine", False)),
        refine_dtype=str(m.get("refine_dtype", "bfloat16")),
    )


def make_factor_graph_config(cfg: dict, edge_capacity: int = 256
                             ) -> FactorGraphConfig:
    o = cfg["local_opt"]
    rt = cfg.get("runtime", {})
    return FactorGraphConfig(
        edge_capacity=edge_capacity,
        max_edge_capacity=int(rt.get("max_edge_capacity", 0)),
        edge_bucket_floor=int(rt.get("edge_bucket_floor", 8)),
        kf_bucket_floor=int(rt.get("kf_bucket_floor", 8)),
        pad_edge_batch=bool(rt.get("pad_edge_batch", True)),
        Q_conf=float(o["Q_conf"]),
        min_match_frac=float(o["min_match_frac"]),
        matcher=str(o.get("matcher", "iter_proj")),
        ba_backend=str(cfg.get("parallel", {}).get("ba_backend", "dense")),
    )


def make_retrieval_config(cfg: dict) -> RetrievalConfig:
    """ASMK scoring parameters from the ``retrieval:`` block (alongside the
    query-time k/min_thresh the system reads directly). Spec: the reference
    exposes these via asmk_params (thirdparty/mast3r/mast3r/retrieval/
    processor.py:91-97)."""
    r = cfg.get("retrieval", {})
    d = RetrievalConfig()
    return RetrievalConfig(
        nfeat=int(r.get("nfeat", d.nfeat)),
        ma_build=int(r.get("ma_build", d.ma_build)),
        ma_query=int(r.get("ma_query", d.ma_query)),
        alpha=float(r.get("alpha", d.alpha)),
        similarity_threshold=float(r.get("similarity_threshold",
                                         d.similarity_threshold)),
    )

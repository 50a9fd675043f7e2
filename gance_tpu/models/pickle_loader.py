"""
Load NVlabs StyleGAN2 `.pkl` network pickles into JAX param pytrees — without TF.

The reference loads pickles by importing the real TF1 `dnnlib` and letting
`Network.__setstate__` rebuild a TF graph (network_functions.py:33,93-111: the
`sys.modules["dnnlib"] = dnnlib` shim, `pickle.load(f)[2]` = Gs, the EMA generator).
Here a *capture-only* unpickler intercepts `dnnlib.tflib.network.Network` and records
the state dict (version, name, static_kwargs, components, variables) instead of
executing the embedded network source. Variable ndarrays are then re-keyed into the
gance_tpu param layout.

Weight layout conversions (TF graph -> gance_tpu NHWC/HWIO):
  * conv weights:          (kh, kw, in, out) — TF is already HWIO; no change.
  * 4x4/Const/const:       (1, C, 4, 4) NCHW -> (1, 4, 4, C).
  * noise buffers:         (1, 1, H, W)      -> (1, H, W, 1).
  * D Dense0 weight:       rows ordered for NCHW flatten (C*4*4) -> re-permuted for
                           NHWC flatten (4*4*C).
  * everything else (dense/mod weights, biases, dlatent_avg, noise_strength): as-is.

Security note: the unpickler only admits numpy scalar/array reconstruction, python
builtins containers, and the captured dnnlib classes; any other global raises.
"""

import io
import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from gance_tpu.models.stylegan2 import GeneratorConfig, config_from_params
from gance_tpu.utils.logging import LOGGER

NETWORK_SUFFIX = ".pkl"


class EasyDict(dict):
    """Mirror of dnnlib.EasyDict: a dict with attribute access (capture-only)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value


class CapturedNetwork:
    """
    Stand-in for dnnlib.tflib.network.Network that records its pickled state
    instead of building a TF graph.
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        self.state: Dict[str, Any] = {}

    def __setstate__(self, state: Dict[str, Any]) -> None:
        self.state = dict(state)

    # --- convenience accessors over the captured state ---
    @property
    def name(self) -> str:
        return str(self.state.get("name", ""))

    @property
    def variables(self) -> Dict[str, np.ndarray]:
        return {name: np.asarray(value) for name, value in self.state.get("variables", [])}

    @property
    def components(self) -> Dict[str, "CapturedNetwork"]:
        comps = self.state.get("components", {}) or {}
        return dict(comps)

    @property
    def static_kwargs(self) -> Dict[str, Any]:
        return dict(self.state.get("static_kwargs", {}) or {})


_ALLOWED_GLOBALS = {
    ("collections", "OrderedDict"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("builtins", "set"),
    ("builtins", "frozenset"),
    ("builtins", "complex"),
    ("builtins", "bytearray"),
    ("_codecs", "encode"),  # numpy array byte payloads under protocol 2
}


class _CaptureUnpickler(pickle.Unpickler):
    """Unpickler admitting only numpy data + the captured dnnlib surface."""

    def find_class(self, module: str, name: str) -> Any:
        if module.startswith("dnnlib"):
            if name == "Network":
                return CapturedNetwork
            if name == "EasyDict":
                return EasyDict
            # Unknown dnnlib helper types (e.g. submit configs) -> inert dict.
            return EasyDict
        if (module, name) in _ALLOWED_GLOBALS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"Blocked global during network unpickling: {module}.{name}"
        )


@dataclass
class LoadedNetworks:
    """The (G, D, Gs) triple as captured state (any element may be None)."""

    generator: Optional[CapturedNetwork]
    discriminator: Optional[CapturedNetwork]
    generator_ema: Optional[CapturedNetwork]


def read_network_pickle(path: Path) -> LoadedNetworks:
    """
    Read an NVlabs-format pickle. Handles both the training triple (G, D, Gs) and
    bare single-network pickles.
    """
    with open(str(path), "rb") as infile:
        obj = _CaptureUnpickler(infile).load()
    if isinstance(obj, CapturedNetwork):
        return LoadedNetworks(None, None, obj)
    if isinstance(obj, (tuple, list)):
        nets = list(obj) + [None] * (3 - len(obj))
        return LoadedNetworks(nets[0], nets[1], nets[2])
    raise ValueError(f"Unrecognized network pickle structure in {path}: {type(obj)}")


# --------------------------------------------------------------------------------
# TF state -> gance_tpu params
# --------------------------------------------------------------------------------


def _nested_set(tree: Dict[str, Any], dotted: str, value: np.ndarray) -> None:
    parts = dotted.split("/")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def generator_params_from_captured(gs: CapturedNetwork) -> Dict[str, Any]:
    """
    Convert a captured Gs network (components: mapping, synthesis) into the
    gance_tpu generator param pytree (jnp-compatible numpy arrays, float32).
    """
    components = gs.components
    if "mapping" not in components or "synthesis" not in components:
        raise ValueError(
            f"Network '{gs.name}' lacks mapping/synthesis components; "
            f"found {list(components)}"
        )

    params: Dict[str, Any] = {"mapping": {}, "synthesis": {"noise": {}}}

    for name, value in gs.variables.items():
        if name == "dlatent_avg":
            params["dlatent_avg"] = value.astype(np.float32).reshape(-1)
        else:
            LOGGER.debug("Ignoring top-level generator variable %s %s", name, value.shape)

    for name, value in components["mapping"].variables.items():
        _nested_set(params["mapping"], name, value.astype(np.float32))

    for name, value in components["synthesis"].variables.items():
        value = value.astype(np.float32)
        if name.startswith("noise"):
            # (1, 1, H, W) -> (1, H, W, 1)
            params["synthesis"]["noise"][name] = np.transpose(value, (0, 2, 3, 1))
        elif name.endswith("Const/const"):
            # (1, C, 4, 4) -> (1, 4, 4, C)
            _nested_set(params["synthesis"], name, np.transpose(value, (0, 2, 3, 1)))
        else:
            _nested_set(params["synthesis"], name, value)

    if "dlatent_avg" not in params:
        w_dim = params["synthesis"]["4x4"]["Conv"]["mod_weight"].shape[0]
        LOGGER.warning("Pickle lacks dlatent_avg; truncation will be a no-op.")
        params["dlatent_avg"] = np.zeros((w_dim,), np.float32)

    return params


def discriminator_params_from_captured(d: CapturedNetwork) -> Dict[str, Any]:
    """Convert a captured D network into the gance_tpu discriminator pytree."""
    params: Dict[str, Any] = {}
    for name, value in d.variables.items():
        value = value.astype(np.float32)
        if name == "4x4/Dense0/weight":
            # TF flattens NCHW (C,4,4); we flatten NHWC (4,4,C): permute rows.
            fan_in, fan_out = value.shape
            c = fan_in // 16
            value = (
                value.reshape(c, 4, 4, fan_out).transpose(1, 2, 0, 3).reshape(fan_in, fan_out)
            )
        _nested_set(params, name, value)
    return params


def load_generator(path: Path) -> Tuple[Dict[str, Any], GeneratorConfig]:
    """
    Load the EMA generator (Gs — element 2 of the triple, matching the reference's
    `pickle.load(f)[2]` at network_functions.py:108-110) as (params, config).
    """
    nets = read_network_pickle(Path(path))
    gs = nets.generator_ema or nets.generator
    if gs is None:
        raise ValueError(f"No generator network found in {path}")
    params = generator_params_from_captured(gs)
    return params, config_from_params(params)


# --------------------------------------------------------------------------------
# gance_tpu params -> TF-format state (interop writer, used by tests and by
# check_move_networks-style tooling to produce loadable sample pickles).
# --------------------------------------------------------------------------------


def _flatten_tree(tree: Dict[str, Any], prefix: str = "") -> List[Tuple[str, np.ndarray]]:
    out: List[Tuple[str, np.ndarray]] = []
    for key, value in tree.items():
        dotted = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.extend(_flatten_tree(value, dotted))
        else:
            out.append((dotted, np.asarray(value)))
    return out


def captured_state_from_generator_params(
    params: Dict[str, Any], name: str = "Gs"
) -> Dict[str, Any]:
    """Build an NVlabs-format state dict (the inverse of the loader conversions)."""
    mapping_vars = _flatten_tree(params["mapping"])

    synthesis_vars: List[Tuple[str, np.ndarray]] = []
    synthesis = params["synthesis"]
    for dotted, value in _flatten_tree({k: v for k, v in synthesis.items() if k != "noise"}):
        if dotted.endswith("Const/const"):
            value = np.transpose(np.asarray(value), (0, 3, 1, 2))
        synthesis_vars.append((dotted, np.asarray(value)))
    for noise_name, value in sorted(
        synthesis.get("noise", {}).items(), key=lambda kv: int(kv[0][5:])
    ):
        synthesis_vars.append((noise_name, np.transpose(np.asarray(value), (0, 3, 1, 2))))

    def network_state(net_name: str, variables: List[Tuple[str, np.ndarray]],
                      components: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        return {
            "version": 4,
            "name": net_name,
            "static_kwargs": {},
            "components": components or {},
            "build_module_src": "# gance_tpu interop pickle (no executable source)",
            "build_func_name": "gance_tpu_stub",
            "variables": [(n, np.asarray(v)) for n, v in variables],
        }

    mapping_net = CapturedNetwork()
    mapping_net.__setstate__(network_state("G_mapping", mapping_vars))
    synthesis_net = CapturedNetwork()
    synthesis_net.__setstate__(network_state("G_synthesis", synthesis_vars))

    top_vars = [("dlatent_avg", np.asarray(params["dlatent_avg"]))]
    return network_state(
        name, top_vars, components={"mapping": mapping_net, "synthesis": synthesis_net}
    )


class _PickleNetwork:
    """Pickles as dnnlib.tflib.network.Network carrying an NVlabs state dict."""

    __module__ = "dnnlib.tflib.network"
    __qualname__ = "Network"

    def __init__(self, state: Dict[str, Any]) -> None:
        self._state = state

    def __getstate__(self) -> Dict[str, Any]:
        return self._state

    def __setstate__(self, state: Dict[str, Any]) -> None:  # pragma: no cover
        self._state = state


def _install_dnnlib_stub_modules() -> None:
    """
    Register stub `dnnlib`/`dnnlib.tflib`/`dnnlib.tflib.network` modules exposing the
    Network class, so pickling under the reference's class path succeeds. This is the
    save-side mirror of the reference's own import shim (network_functions.py:33).
    """
    import sys
    import types

    network_mod = sys.modules.get("dnnlib.tflib.network")
    if network_mod is None:
        network_mod = types.ModuleType("dnnlib.tflib.network")
        sys.modules["dnnlib.tflib.network"] = network_mod
    network_mod.Network = _PickleNetwork  # type: ignore[attr-defined]

    tflib_mod = sys.modules.setdefault("dnnlib.tflib", types.ModuleType("dnnlib.tflib"))
    tflib_mod.network = network_mod  # type: ignore[attr-defined]
    dnnlib_mod = sys.modules.setdefault("dnnlib", types.ModuleType("dnnlib"))
    dnnlib_mod.tflib = tflib_mod  # type: ignore[attr-defined]
    dnnlib_mod.EasyDict = EasyDict  # type: ignore[attr-defined]


def save_generator_pickle(params: Dict[str, Any], path: Path) -> None:
    """
    Write generator params as an NVlabs-format (G, D, Gs) triple pickle whose class
    references resolve to dnnlib.tflib.network.Network. Used to fabricate loadable
    sample networks for tests and tooling (real TF is NOT required to read them back
    here, and the reference's own loader would accept the structure).
    """

    _install_dnnlib_stub_modules()

    def wrap(state: Dict[str, Any]) -> _PickleNetwork:
        # Recursively wrap component CapturedNetworks so they pickle under the
        # dnnlib class path too.
        comps = {
            key: wrap(net.state) for key, net in (state.get("components") or {}).items()
        }
        new_state = dict(state)
        new_state["components"] = comps
        return _PickleNetwork(new_state)

    gs_state = captured_state_from_generator_params(params)
    gs = wrap(gs_state)
    payload = (gs, None, gs)  # (G, D, Gs); reference reads element 2

    buffer = io.BytesIO()
    pickler = pickle.Pickler(buffer, protocol=2)
    pickler.dump(payload)
    Path(path).write_bytes(buffer.getvalue())


# --------------------------------------------------------------------------------
# Network discovery (reference network_functions.py:38-48, 643-682)
# --------------------------------------------------------------------------------


def sorted_networks_in_directory(directory: Path) -> List[Path]:
    """Alphanumeric sort of `*.pkl` in a directory — the reference's discovery rule."""
    return sorted(Path(directory).glob(f"*{NETWORK_SUFFIX}"))


def parse_network_paths(
    networks_directory: Optional[Path],
    network_paths: Optional[List[Path]],
    networks_json: Optional[Path],
) -> List[Path]:
    """
    Merge the three CLI network sources: a directory (sorted), explicit repeated
    paths, and a JSON file {"networks": [paths...]}. Reference
    network_functions.py:643-690 (pydantic NetworksFile schema).
    """
    import json

    paths: List[Path] = []
    if networks_directory is not None:
        paths.extend(sorted_networks_in_directory(Path(networks_directory)))
    if network_paths:
        paths.extend(Path(p) for p in network_paths)
    if networks_json is not None:
        blob = json.loads(Path(networks_json).read_text())
        if not isinstance(blob, dict) or "networks" not in blob:
            raise ValueError(f"{networks_json} must contain a 'networks' list")
        for p in blob["networks"]:
            candidate = Path(p)
            if not candidate.is_file():
                raise ValueError(f"networks-json entry is not a file: {candidate}")
            paths.append(candidate)
    if not paths:
        raise ValueError("No networks given (directory, paths, or json required).")
    return paths

"""Import the PyTorch reference (CPU) as a golden-value oracle for tests.

The reference at /root/reference assumes CUDA plus several packages that are
absent here (chumpy, trimesh, lmdb, skimage, torchvision, tqdm, sklearn).
This module stubs those imports, no-ops ``.cuda()``, and replaces the
chumpy-based MANO loader with our own pickle extraction so reference modules
run unmodified on CPU.  Tests compare alignsdf_tpu outputs against them.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_initialized = False


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        try:  # prefer the real package when it is actually installed
            import importlib

            mod = importlib.import_module(name)
        except ImportError:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    if not getattr(mod, "__file__", None):  # only add attrs to fakes
        for key, value in attrs.items():
            setattr(mod, key, value)
    # register as attribute of parent package
    if "." in name:
        parent_name, child = name.rsplit(".", 1)
        parent = sys.modules.get(parent_name)
        if parent is not None and not getattr(parent, "__file__", None):
            setattr(parent, child, mod)
    return mod


class _NumpyHolder:
    """Mimics a chumpy array just enough for ManoLayer's loader accesses."""

    def __init__(self, x):
        self.r = np.asarray(x)

    def toarray(self):
        return self.r


def _fake_ready_arguments(fname_or_dict, posekey4vposed="pose"):
    """Replacement for reference mano/webuser/smpl_handpca_wrapper_HAND_only.py:22-67
    returning only what ManoLayer.__init__ reads (reference manopth/manolayer.py:65-107)."""
    from alignsdf_tpu.mano.convert import load_mano_pkl

    raw = load_mano_pkl(fname_or_dict)
    dd = {}
    for key in ("v_template", "weights", "posedirs", "shapedirs", "betas"):
        if key in raw:
            dd[key] = _NumpyHolder(raw[key])
    if "betas" not in dd:
        dd["betas"] = _NumpyHolder(np.zeros(raw["shapedirs"].shape[-1]))
    dd["J_regressor"] = _NumpyHolder(raw["J_regressor"])
    dd["f"] = np.asarray(raw["f"] if "f" in raw else raw["faces"])
    dd["hands_components"] = np.asarray(raw["hands_components"])
    dd["hands_mean"] = np.asarray(raw["hands_mean"])
    dd["kintree_table"] = np.asarray(raw["kintree_table"])
    return dd


def setup_reference() -> None:
    """Make ``import manopth...``, ``import networks...``, ``import utils.utils``
    etc. resolve to the reference implementation, runnable on CPU."""
    global _initialized
    if _initialized:
        return
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # --- no-op CUDA so reference `.cuda()` calls run on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    # --- stub unavailable third-party packages
    _stub_module("trimesh", Trimesh=object, load=None)
    _stub_module("trimesh.graph", split=None)
    _stub_module("trimesh.sample", sample_surface=None)
    _stub_module("trimesh.registration", icp=None)
    _stub_module("lmdb", open=None)
    _stub_module("skimage")
    _stub_module("skimage.measure", marching_cubes_lewiner=None)
    _stub_module("tqdm", tqdm=lambda x, **k: x)
    _stub_module("sklearn")
    _stub_module("sklearn.neighbors", KDTree=None)
    _stub_module("plyfile", PlyData=object, PlyElement=object)

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for fn in self.fns:
                x = fn(x)
            return x

    class _ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic).astype(np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1))

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    _stub_module(
        "torchvision",
        transforms=_stub_module(
            "torchvision.transforms",
            Compose=_Compose,
            ToPILImage=lambda: (lambda x: x),
            ToTensor=_ToTensor,
            Normalize=_Normalize,
        ),
        models=_stub_module("torchvision.models"),
    )

    # --- replace the chumpy-based MANO loader before manopth imports it.
    # The reference module imports fine (chumpy is imported lazily inside
    # ready_arguments), so force-override the function on whichever module —
    # real or fake — ended up in sys.modules.
    _stub_module("mano")
    _stub_module("mano.webuser")
    loader_mod = _stub_module("mano.webuser.smpl_handpca_wrapper_HAND_only")
    loader_mod.ready_arguments = _fake_ready_arguments

    _initialized = True


_mesh_stub_rng = {"gen": None}


def reset_mesh_sampling_rng(seed: int = 0) -> None:
    """Reset the shared sampling stream used by the trimesh.sample stub, so a
    reference ICP run draws the same samples as alignsdf_tpu's
    ICPTransScale.sample_mesh (eval/icp.py seeds default_rng(0) and shares
    one stream across source+target)."""
    _mesh_stub_rng["gen"] = np.random.default_rng(seed)


def install_mesh_stubs() -> None:
    """Back the trimesh/skimage/sklearn stubs with REAL implementations from
    alignsdf_tpu (geom.meshlib / geom.marching_cubes / scipy), so the
    reference's full mesh pipeline (utils/mesh.py:331-398 + reconstruct.py)
    runs end-to-end on CPU.  Both pipelines then share the same marching
    cubes / component-split / surface-sampler code, isolating the composition
    under test (grid fields -> MC -> largest CC -> ICP -> PLY)."""
    setup_reference()
    import sys

    import torch

    from alignsdf_tpu.geom.marching_cubes import marching_cubes
    from alignsdf_tpu.geom import meshlib

    # The reference mesh path was written for old torch where `/` on integer
    # tensors truncated: `(overall_index.long() / N) % N`
    # (reference utils/mesh.py:31-32,85-86) yields FRACTIONAL grid indices on
    # modern torch, shearing its sampling grid by up to a voxel.  Restore the
    # old semantics so the reference computes its intended grid.
    if not getattr(torch.Tensor.__truediv__, "_alignsdf_compat", False):
        _orig_truediv = torch.Tensor.__truediv__

        def _compat_truediv(self, other):
            if (not torch.is_floating_point(self)
                    and not torch.is_complex(self)
                    and isinstance(other, int)):
                return torch.div(self, other, rounding_mode="floor")
            return _orig_truediv(self, other)

        _compat_truediv._alignsdf_compat = True
        _compat_truediv._alignsdf_orig = _orig_truediv
        torch.Tensor.__truediv__ = _compat_truediv

    # reference ICP uses the np.float alias removed in numpy 1.24
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]

    class _RefTrimesh(meshlib.TriMesh):
        def __init__(self, vertices=None, faces=None, process=False):
            super().__init__(np.asarray(vertices, np.float64),
                             np.asarray(faces, np.int64))

    def _mc_lewiner(volume, level=0.0, spacing=(1.0, 1.0, 1.0), **_):
        verts, faces = marching_cubes(np.asarray(volume), float(level),
                                      spacing=tuple(spacing))
        return verts, faces, None, None

    def _graph_split(mesh, only_watertight=True):
        return meshlib.split_components(mesh)

    def _sample_surface(mesh, count):
        if _mesh_stub_rng["gen"] is None:
            reset_mesh_sampling_rng()
        pts = meshlib.sample_surface(mesh, count, rng=_mesh_stub_rng["gen"])
        return pts, None

    class _KDTree:
        def __init__(self, data):
            from scipy.spatial import cKDTree

            self._t = cKDTree(np.asarray(data))

        def query(self, x, k=1):
            d, i = self._t.query(np.asarray(x), k=k)
            return d.reshape(-1, k), i.reshape(-1, k)

    def _load(path, process=False):
        m = meshlib.load_mesh(path)
        return _RefTrimesh(m.vertices, m.faces)

    sys.modules["trimesh"].Trimesh = _RefTrimesh
    sys.modules["trimesh"].load = _load
    sys.modules["trimesh.graph"].split = _graph_split
    sys.modules["trimesh"].graph = sys.modules["trimesh.graph"]
    sys.modules["trimesh.sample"].sample_surface = _sample_surface
    sys.modules["trimesh"].sample = sys.modules["trimesh.sample"]
    sys.modules["skimage.measure"].marching_cubes_lewiner = _mc_lewiner
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    sys.modules["sklearn.neighbors"].KDTree = _KDTree
    sys.modules["sklearn"].neighbors = sys.modules["sklearn.neighbors"]


def uninstall_torch_div_compat() -> None:
    """Restore modern torch integer-division semantics (the mesh tests patch
    them for the reference's old-torch mesh path; restore afterwards so other
    tests in the same pytest process are order-independent)."""
    import torch

    cur = torch.Tensor.__truediv__
    if getattr(cur, "_alignsdf_compat", False):
        torch.Tensor.__truediv__ = cur._alignsdf_orig



def reference_mano_layer(ncomps: int = 15, center_idx: int = 0, side: str = "right",
                         flat_hand_mean: bool = False, use_pca: bool = True):
    """Build the reference ManoLayer on CPU (reference manopth/manolayer.py:13)."""
    setup_reference()
    from manopth.manolayer import ManoLayer

    return ManoLayer(
        ncomps=ncomps,
        center_idx=center_idx,
        side=side,
        mano_root=f"{REFERENCE_ROOT}/mano",
        use_pca=use_pca,
        flat_hand_mean=flat_hand_mean,
    )


def reference_full_model(specs_dict):
    """Build the reference ModelOneEncoderOneDecoder on CPU with random init
    (reference train.py:333-369 composition; pretrained download replaced by
    random init since the environment has no network)."""
    import os

    setup_reference()
    import torch
    import networks.resnet as ref_resnet
    import networks.model as arch
    import networks.manobranch as mano

    cwd = os.getcwd()
    os.chdir(REFERENCE_ROOT)
    try:
        backbone = specs_dict.get("Backbone", "resnet18")
        latent_size = specs_dict.get("LatentSize", 256)
        mano_branch = specs_dict.get("ManoBranch", False)
        obj_pose = specs_dict.get("ObjectPoseBranch", False) and mano_branch
        use_headnet = obj_pose or specs_dict.get("Render", False) or specs_dict.get("PixelAlign", False)
        pixel_align = specs_dict.get("PixelAlign", False)

        ctor = {"resnet18": ref_resnet.resnet18, "resnet34": ref_resnet.resnet34,
                "resnet50": ref_resnet.resnet50}[backbone]
        encoder = ctor(pretrained=False, mano_features=mano_branch,
                       use_headnet=use_headnet, use_pixel_align=pixel_align)
        if pixel_align:
            encoder.fc = torch.nn.AvgPool2d(7, stride=1)
        else:
            encoder.fc = torch.nn.Linear(encoder.fc.in_features, latent_size)
        if use_headnet:
            encoder.aux_layer = arch.HeadNet()

        if mano_branch:
            mano_decoder = mano.ManoBranch(
                ncomps=specs_dict.get("PoseFeatSize", 15),
                absolute_depth=specs_dict.get("DepthBranch", False) and mano_branch,
                object_pose=obj_pose,
                use_obj_rot=obj_pose and specs_dict.get("ObjCornerWeight", 0.2) > 0,
                mano_root="mano",
            )
        else:
            mano_decoder = None

        net_specs = specs_dict["NetworkSpecs"]
        dec_cls = (arch.CombinedDecoder
                   if specs_dict.get("ModelType") == "1encoder1decoder"
                   else arch.SeparateDecoder)
        decoder = dec_cls(
            latent_size, specs_dict.get("PointFeatSize", 3),
            specs_dict.get("EncodeStyle", "nerf"), **net_specs,
            use_classifier=specs_dict.get("ClassifierBranch", False),
        )
        model = arch.ModelOneEncoderOneDecoder(encoder, decoder, mano_decoder, specs_dict)
        return model.eval()
    finally:
        os.chdir(cwd)

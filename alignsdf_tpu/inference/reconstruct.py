"""Per-image reconstruction driver — reference reconstruct.py:33-95 +
utils/mesh.py host-side logic, rebuilt around the sharded grid engine.

Flow per image (reference parity):
  1. encode image -> latent / mano results / object pose
  2. export predicted MANO mesh + params json (reference utils/utils.py:575-589)
  3. export transformed rest-pose object mesh (reference utils/utils.py:591-618)
  4. two-pass sharded grid eval -> hand/object SDF fields (device)
  5. marching cubes + largest-component + PLY export (host,
     reference utils/mesh.py:331-381)
  6. eval mode: trans+scale ICP against the GT mesh (reference utils/mesh.py:385-395)
  7. label_out: re-query hand-part labels at mesh vertices (reference
     utils/mesh.py:137-184)
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from alignsdf_tpu.config import Specs
from alignsdf_tpu.eval.icp import ICPTransScale
from alignsdf_tpu.geom.marching_cubes import marching_cubes
from alignsdf_tpu.geom.meshlib import TriMesh, largest_component, load_mesh, write_ply
from alignsdf_tpu.inference.grid import GridResult, make_grid_evaluator
from alignsdf_tpu.ops.embeddings import kinematic_embedding, nerf_embed_for_point_feat

logger = logging.getLogger(__name__)

PART_COLORS = np.array(
    [[13, 212, 128], [250, 70, 42], [131, 66, 37],
     [78, 137, 54], [187, 246, 163], [67, 220, 74]], np.uint8
)  # reference utils/mesh.py:316-323


def field_to_mesh(
    sdf_field: np.ndarray,
    origin: np.ndarray,
    voxel_size: float,
) -> Optional[TriMesh]:
    """Marching cubes + largest connected component
    (reference utils/mesh.py:331-381)."""
    try:
        verts, faces = marching_cubes(sdf_field, 0.0, spacing=(voxel_size,) * 3)
    except ValueError as e:
        logger.warning("Cannot reconstruct mesh: %s", e)
        return None
    verts = verts + np.asarray(origin, np.float32)[None]
    return largest_component(TriMesh(verts, faces))


def export_with_optional_icp(
    mesh: TriMesh, out_path: str, gt_mesh_path: Optional[str] = None
):
    """PLY export; in eval mode align to GT with trans+scale ICP first
    (reference utils/mesh.py:383-398). Returns (trans, scale)."""
    if gt_mesh_path is not None and os.path.isfile(gt_mesh_path):
        target = load_mesh(gt_mesh_path)
        solver = ICPTransScale(mesh, target)
        solver.sample_mesh(30000, "both")
        solver.run_icp_f(max_iter=100)
        solver.export_source_mesh(out_path)
        return solver.get_trans_scale()
    mesh.export(out_path)
    return np.zeros((1, 3)), np.array([1.0])


class Reconstructor:
    """Holds the jitted encoder and grid programs for one spec/model."""

    def __init__(
        self,
        model,                      # AlignSDF flax module
        variables: Dict[str, Any],  # {'params', 'batch_stats'}
        specs: Specs,
        cube_dim: int = 128,
        chunk: int = 1 << 18,
        mesh=None,
        decode_fn: Optional[Callable] = None,
        mano_faces: Optional[np.ndarray] = None,
        grid_dtype=None,
        pixel_ref_projection: bool = False,
    ):
        self.model = model
        self.variables = variables
        self.specs = specs
        self.cube_dim = cube_dim
        self.mano_faces = mano_faces
        # reference-compat: reproduce the reference mesh path's embedded-
        # column projection for pixel configs (a train/inference
        # inconsistency in the reference — inference/grid.py docstring);
        # default False projects raw coords like the train path
        self.pixel_ref_projection = pixel_ref_projection

        if decode_fn is None:
            def decode_fn(ctx, inputs):
                return model.apply({"params": ctx["params"]}, inputs,
                                   method=model.decode_points)

        # fully fused fast path (in-kernel coords + affine-embedding/latent
        # folding) when the config allows it: single broadcast latent and
        # raw-xyz or kinematic features, with the transforms the embedding
        # probe needs guaranteed present in ctx.  TPU only — on CPU the
        # kernel would run in (slow) interpret mode.
        style = specs.encode_style
        fusable = (
            (style == "nerf" and specs.point_feat_size == 3)
            or (style == "hand" and specs.mano_branch)
            or (style in ("obj", "both")
                and specs.mano_branch and specs.object_pose_branch)
        )
        import jax.numpy as jnp

        kdtype = grid_dtype or jnp.float32
        grid_decode_fn = None
        if fusable and jax.default_backend() not in ("cpu",):
            if specs.pixel_align:
                # per-point latents: in-kernel bicubic-as-matmul sampling of
                # the HeadNet map (ops/decoder_kernel.
                # make_fused_pixel_grid_decode_fn)
                from alignsdf_tpu.ops.decoder_kernel import (
                    make_fused_pixel_grid_decode_fn,
                )

                # banded sampling contraction (band="auto") with block 512:
                # 40.9M q/s bf16 at 256^3 vs 34.2M full-contraction (r5;
                # banded sweep 512/1024/2048 -> 40.9/39.3/40.4, full best
                # 1024 -> 34.4); wide-span cameras fall back to the full
                # kernel inside the same program
                grid_decode_fn = make_fused_pixel_grid_decode_fn(
                    specs, cube_dim, block=512, dtype=kdtype,
                    ref_projection=pixel_ref_projection)
            else:
                from alignsdf_tpu.ops.decoder_kernel import (
                    make_fused_grid_decode_fn,
                )

                # lanes-major kernel; block 2048 measured ~3% over 1024 at
                # 256^3 (4096 is reserved for the dedicated bench — it sits
                # at the scoped-VMEM edge and classifier configs add an
                # extra matmul)
                grid_decode_fn = make_fused_grid_decode_fn(
                    specs, cube_dim, block=2048, dtype=kdtype)

        self.evaluate_grid = make_grid_evaluator(
            decode_fn, specs, cube_dim, chunk=chunk, mesh=mesh, two_pass=True,
            grid_decode_fn=grid_decode_fn,
            pixel_ref_projection=pixel_ref_projection,
        )

        @jax.jit
        def encode(vars_, image, cam_intr, mano_root, rest_obj_corners,
                   points=None):
            return model.apply(
                vars_, image, cam_intr, mano_root, rest_obj_corners,
                points=points, method=model.encode_scene,
            )

        self._encode = lambda *a: encode(self.variables, *a)

    def submit(self, sample: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Dispatch the device work for one image (encode + sharded grid
        eval) WITHOUT forcing any host transfer.  Returns a pending record
        for finalize(); submit(i+1) can overlap device compute with
        finalize(i)'s host-side marching cubes / exports."""
        points = sample.get("points")
        latent, mano_results, obj_results = self._encode(
            jnp.asarray(sample["image"])[None],
            jnp.asarray(sample["cam_intr"])[None],
            jnp.asarray(sample["mano_root"]).reshape(1, -1),
            jnp.asarray(sample["rest_obj_corners"])[None],
            jnp.asarray(points)[None] if points is not None else None,
        )
        if self.specs.pixel_align:
            # encode_scene returns the HeadNet map NHWC; pixel_alignment
            # consumes NCHW (reference utils/utils.py:536-558)
            latent = latent.transpose(0, 3, 1, 2)
        ctx: Dict[str, Any] = {
            "params": self.variables["params"],
            "decoder_params": self.variables["params"]["decoder"],
            "latent": latent,
        }
        if self.specs.pixel_align:
            ctx["cam_intr"] = jnp.asarray(sample["cam_intr"])[None]
            ctx["pred_root"] = mano_results["joints"][:, 0:1]
        if mano_results is not None and self.specs.encode_style != "nerf":
            ctx["rot_center"] = mano_results["rot_center"]
            ctx["global_trans"] = mano_results["global_trans"]
        if obj_results is not None:
            ctx["obj_trans"] = obj_results["obj_trans"]
        result = self.evaluate_grid(ctx)
        return {
            "sample": sample,
            "ctx": ctx,
            "mano_results": mano_results,
            "obj_results": obj_results,
            "grid": result,
        }

    def __call__(self, sample: Dict[str, np.ndarray], out_dirs: Dict[str, str],
                 label_out: bool = False, viz: bool = False,
                 eval_mode: bool = False, task: str = "obman") -> None:
        self.finalize(self.submit(sample), out_dirs, label_out=label_out,
                      viz=viz, eval_mode=eval_mode, task=task)

    def finalize(self, pending: Dict[str, Any], out_dirs: Dict[str, str],
                 label_out: bool = False, viz: bool = False,
                 eval_mode: bool = False, task: str = "obman") -> None:
        """Host side of one image: exports, marching cubes, ICP, labels."""
        specs = self.specs
        sample = pending["sample"]
        prefix = sample["key"]
        mano_results = pending["mano_results"]
        obj_results = pending["obj_results"]

        # --- MANO mesh + parameter export (reference utils/utils.py:579-589)
        if mano_results is not None:
            verts = np.asarray(mano_results["verts"][0])
            joints = np.asarray(mano_results["joints"][0])
            mano_para = {
                "joints": joints.tolist(),
                "vertices": verts.tolist(),
                "shape": np.asarray(mano_results["shape"][0]).tolist(),
                "pose": np.asarray(mano_results["pcas"][0]).tolist(),
            }
            with open(os.path.join(out_dirs["pred_mano"], prefix + ".json"), "w") as f:
                json.dump(mano_para, f)
            if self.mano_faces is not None:
                TriMesh(verts, self.mano_faces).export(
                    os.path.join(out_dirs["pred_mano"], prefix + ".ply")
                )

        # --- transformed object mesh export (reference utils/utils.py:591-618)
        if obj_results is not None and "obj_dir" in out_dirs:
            obj_trans = np.asarray(obj_results["obj_trans"][0])
            center3d = np.asarray(mano_results["center3d"][0])
            rest_path = os.path.join(
                specs.data_source, task, "test", "mesh_obj_rest", prefix + ".obj"
            )
            if os.path.isfile(rest_path):
                rest_mesh = load_mesh(rest_path)
                v = rest_mesh.vertices
                v = (obj_trans[:3, :3] @ v.T).T + obj_trans[:3, 3]
                v = v + center3d
                TriMesh(v, rest_mesh.faces).export(
                    os.path.join(out_dirs["obj_dir"], prefix + ".obj")
                )
            obj_para = {
                "obj_corners": np.asarray(obj_results["obj_corners"][0]).tolist(),
                "obj_trans": obj_trans.tolist(),
            }
            with open(os.path.join(out_dirs["obj_dir"], prefix + ".json"), "w") as f:
                json.dump(obj_para, f)

        ctx = pending["ctx"]
        result: GridResult = pending["grid"]
        origin = np.asarray(result.origin)
        voxel = float(result.voxel_size)

        mesh_base = os.path.join(out_dirs["meshes"], prefix)
        hand_mesh = None
        if specs.hand_branch:
            hand_mesh = field_to_mesh(np.asarray(result.sdf_hand), origin, voxel)
            if hand_mesh is not None:
                gt = (
                    os.path.join(specs.data_source, task, "test", "mesh_hand", prefix + ".obj")
                    if eval_mode else None
                )
                export_with_optional_icp(hand_mesh, mesh_base + "_hand.ply", gt)

        if specs.obj_branch:
            obj_mesh = field_to_mesh(np.asarray(result.sdf_obj), origin, voxel)
            if obj_mesh is not None:
                gt = (
                    os.path.join(specs.data_source, task, "test", "mesh_obj", prefix + ".obj")
                    if eval_mode else None
                )
                export_with_optional_icp(obj_mesh, mesh_base + "_obj.ply", gt)

        # --- per-vertex hand-part labels (reference utils/mesh.py:137-184)
        if label_out and hand_mesh is not None and specs.classifier_branch:
            labels = self._query_labels(ctx, hand_mesh.vertices)
            np.savez(
                mesh_base + "_hand_label.npz",
                points=hand_mesh.vertices.astype(np.float32),
                labels=labels.astype(np.float32),
            )
            if viz:
                colors = PART_COLORS[labels.astype(np.int32) % len(PART_COLORS)]
                write_ply(mesh_base + "_hand_color.ply", hand_mesh.vertices,
                          hand_mesh.faces, vertex_colors=colors)

    def _query_labels(self, ctx: Dict[str, Any], verts: np.ndarray) -> np.ndarray:
        specs = self.specs
        pts = jnp.asarray(verts, jnp.float32)
        if specs.point_feat_size > 3:
            if "global_trans" in ctx and specs.encode_style != "nerf":
                emb = kinematic_embedding(
                    pts, pts.shape[0], specs.point_feat_size, specs.sdf_scale_factor,
                    specs.encode_style, rot_center=ctx.get("rot_center"),
                    global_trans=ctx.get("global_trans"), obj_trans=ctx.get("obj_trans"),
                )
            else:
                emb = nerf_embed_for_point_feat(pts, specs.point_feat_size)
        else:
            emb = pts
        if ctx["latent"].ndim == 4:
            from alignsdf_tpu.ops.geometry import pixel_alignment

            proj_pts = emb[:, :3] if self.pixel_ref_projection else pts
            latent = pixel_alignment(
                ctx["latent"], proj_pts, ctx["cam_intr"], ctx["pred_root"],
                specs.image_size[0], specs.sdf_scale_factor)
        else:
            latent = jnp.broadcast_to(ctx["latent"],
                                      (emb.shape[0], ctx["latent"].shape[1]))
        inputs = jnp.concatenate([latent, emb], axis=1)
        _, _, logits = self.model.apply({"params": ctx["params"]}, inputs,
                                        method=self.model.decode_points)
        return np.asarray(jnp.argmax(logits, axis=-1))


def run_pipelined(recon: Reconstructor, samples, out_dirs: Dict[str, str],
                  label_out: bool = False, viz: bool = False,
                  eval_mode: bool = False, task: str = "obman",
                  on_done: Optional[Callable[[int, Dict[str, Any]], None]] = None,
                  lookahead: int = 2) -> int:
    """Reconstruct a sequence with ``lookahead`` images of device work
    (encode + sharded grid eval) in flight ahead of the host work (marching
    cubes, ICP, exports) — JAX's async dispatch overlaps them, and a deeper
    window also hides per-dispatch/fetch round-trips on high-latency links.
    Each pending image holds two N^3 f32 fields on device (16 MB at 128^3).
    Returns the number of images processed."""
    from collections import deque

    window: "deque" = deque()
    count = 0
    n = len(samples)
    lookahead = max(1, lookahead)
    for i in range(n):
        window.append((i, recon.submit(samples[i])))
        if len(window) > lookahead:
            idx, pending = window.popleft()
            recon.finalize(pending, out_dirs, label_out=label_out, viz=viz,
                           eval_mode=eval_mode, task=task)
            count += 1
            if on_done is not None:
                on_done(idx, pending)
    while window:
        idx, pending = window.popleft()
        recon.finalize(pending, out_dirs, label_out=label_out, viz=viz,
                       eval_mode=eval_mode, task=task)
        count += 1
        if on_done is not None:
            on_done(idx, pending)
    return count


def make_output_dirs(output_dir: str) -> Dict[str, str]:
    """Workspace layout (reference reconstruct.py:34-48)."""
    dirs = {
        "meshes": os.path.join(output_dir, "meshes"),
        "pred_mano": os.path.join(output_dir, "pred_mano"),
        "optim_mano": os.path.join(output_dir, "optim_mano"),
        "mask": os.path.join(output_dir, "mask"),
        "obj_dir": os.path.join(output_dir, "object"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    return dirs

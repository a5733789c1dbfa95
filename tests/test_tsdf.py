"""TSDF fusion tests: reconstruct a known sphere from synthetic depth maps."""

import numpy as np

from gof_tpu import cameras
from gof_tpu.mesh import tsdf as tsdf_lib
from gof_tpu.ops.blend import pixel_rays


def sphere_depth(cam, center, radius):
    """Analytic depth map (view-space z at the first ray-sphere hit)."""
    rx, ry = pixel_rays(cam.width, cam.height, cam.focal_x, cam.focal_y)
    d = np.stack([np.asarray(rx), np.asarray(ry), np.ones_like(np.asarray(rx))], -1)
    wv = np.asarray(cam.world_view)
    R = wv[:3, :3]
    o = np.asarray(cam.cam_center)
    dirs = d @ R  # view->world (rows of R are world axes in view coords)
    oc = o - center
    b = 2 * dirs @ oc
    a = (dirs * dirs).sum(-1)
    c = oc @ oc - radius**2
    disc = b * b - 4 * a * c
    t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
    return np.where(t > 0, t, 0.0).astype(np.float32)


class TestTSDF:
    def test_sphere_reconstruction(self):
        center = np.array([0.0, 0.0, 0.0])
        radius = 0.5
        cams, depths = [], []
        for i, th in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False)):
            cam = cameras.look_at_camera(
                eye=(2.5 * np.sin(th), 0.8, 2.5 * np.cos(th)), target=(0, 0, 0),
                width=96, height=96, uid=i,
            )
            cams.append(cam)
            depths.append(sphere_depth(cam, center, radius))

        lo = np.array([-0.8, -0.8, -0.8], np.float32)
        voxel = 0.025
        dims = (65, 65, 65)
        tsdf, weight = tsdf_lib.fuse_depth_maps(
            depths, cams, lo, voxel, dims, sdf_trunc=0.1, depth_min=0.3, depth_max=6.0
        )
        # narrow-band behavior: a voxel just inside the surface is negative,
        # just outside positive (the deep interior stays unobserved = +1)
        p_in = center + np.array([radius - 1.5 * voxel, 0, 0])
        p_out = center + np.array([radius + 1.5 * voxel, 0, 0])
        vi = tuple(((p_in - lo) / voxel).astype(int))
        vo = tuple(((p_out - lo) / voxel).astype(int))
        assert weight[vi] > 0 and tsdf[vi] < 0, (tsdf[vi], weight[vi])
        assert weight[vo] > 0 and tsdf[vo] > 0, (tsdf[vo], weight[vo])

        verts, faces = tsdf_lib.grid_to_mesh(tsdf, weight, lo, voxel)
        assert len(verts) > 200 and len(faces) > 200
        r = np.linalg.norm(verts - center, axis=-1)
        # reconstructed surface within ~1.5 voxels of the true sphere
        assert abs(np.median(r) - radius) < 1.5 * voxel
        assert np.quantile(np.abs(r - radius), 0.9) < 3 * voxel

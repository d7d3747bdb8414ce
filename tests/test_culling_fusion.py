import jax
import jax.numpy as jnp
import numpy as np

from pointcloudprocessor_tpu.core import se3
from pointcloudprocessor_tpu.ops import fusion, voxel, zbuffer
from pointcloudprocessor_tpu.pipeline import colorize

from synthetic import gradient_image, simple_camera, wall_scene


def test_zbuffer_culls_hidden_wall_points():
    c = simple_camera()
    pts, is_occ, hidden = wall_scene(c)
    valid = jnp.ones(len(pts), bool)
    mask = np.asarray(
        zbuffer.cull_mask(c, jnp.asarray(pts), valid, downsample_factor=4, depth_epsilon=0.25)
    )
    # All occluder points visible.
    assert mask[is_occ].all()
    # Hidden wall points (behind occluder) rejected.
    assert (~mask[hidden]).all()
    # Non-hidden wall points survive (excluding a one-cell band around the
    # occluder edge, where z-buffer cell granularity legitimately dilates
    # the occlusion by up to downsample_factor pixels).
    import jax.numpy as _jnp
    from pointcloudprocessor_tpu.models import camera as _cam

    px = np.asarray(_cam.project(c, _jnp.asarray(pts)))
    cx, cy, w, h, ds = c.width / 2, c.height / 2, c.width, c.height, 4
    near_edge = (
        (px[:, 0] > cx - w / 8 - ds)
        & (px[:, 0] < cx + w / 8 + ds)
        & (px[:, 1] > cy - h / 8 - ds)
        & (px[:, 1] < cy + h / 8 + ds)
    )
    visible_wall = ~is_occ & ~hidden & ~near_edge
    assert mask[visible_wall].all()


def test_zbuffer_rejects_behind_camera_and_out_of_image():
    c = simple_camera()
    pts = jnp.asarray([[0.0, 0.0, -1.0], [100.0, 0.0, 1.0], [0.0, 0.0, 2.0]], jnp.float32)
    mask = np.asarray(zbuffer.cull_mask(c, pts, jnp.ones(3, bool), 4, 0.05))
    np.testing.assert_array_equal(mask, [False, False, True])


def test_topk_update_and_blend():
    state = fusion.init_topk(2, k=3)
    # Point 0 receives scores 0.5, 0.9, 0.7, 0.8 -> top3 = {0.9, 0.8, 0.7}
    seq = [0.5, 0.9, 0.7, 0.8]
    colors = [[10.0, 0, 0], [20, 0, 0], [30, 0, 0], [40, 0, 0]]
    for s, col in zip(seq, colors):
        state = fusion.update_topk(
            state,
            jnp.asarray([s, 0.0], jnp.float32),
            jnp.asarray([col, [0, 0, 0]], jnp.float32),
            jnp.asarray([True, False]),
        )
    rgb, colored = fusion.blend_topk(state)
    assert bool(colored[0]) and not bool(colored[1])
    want = (0.9 * 20 + 0.7 * 30 + 0.8 * 40) / (0.9 + 0.7 + 0.8)
    np.testing.assert_allclose(float(rgb[0, 0]), want, rtol=1e-5)


def test_scores_in_range_and_peaks():
    pts = jnp.asarray([[0.0, 0, 2.0], [0, 0, 10.0], [3.0, 0, 0.1]], jnp.float32)
    o = np.asarray(fusion.orientation_score(pts))
    d = np.asarray(fusion.distance_score(pts))
    assert ((o >= 0.2) & (o <= 1.0)).all()
    assert ((d >= 0.2) & (d <= 1.0)).all()
    # On-axis point scores highest orientation; 2 m point highest distance.
    assert o[0] > o[2]
    np.testing.assert_allclose(d[0], 1.0, atol=1e-6)


def test_sample_nearest_truncation():
    img = jnp.asarray(gradient_image(16, 8))
    px = jnp.asarray([[3.9, 2.1], [0.0, 0.0]], jnp.float32)
    got = np.asarray(fusion.sample_nearest(img, px))
    want0 = np.asarray(gradient_image(16, 8))[2, 3]
    np.testing.assert_array_equal(got[0], want0)


def test_observe_keyframe_samples_gradient():
    c = simple_camera()
    img = jnp.asarray(gradient_image(c.width, c.height))
    pts, _, _ = wall_scene(c)
    obs = colorize.observe_keyframe(
        c, img, se3.identity(), jnp.asarray(pts), jnp.ones(len(pts), bool), downsample_factor=4, depth_epsilon=0.25
    )
    vis = np.asarray(obs.visible)
    px = np.asarray(obs.pixels)[vis]
    rgb = np.asarray(fusion.unpack_rgb(obs.rgb_packed))[vis]
    # R channel encodes u: r = u*255//(W-1)
    want_r = (px[:, 0].astype(int) * 255) // (c.width - 1)
    np.testing.assert_allclose(rgb[:, 0], want_r, atol=1.0)


def test_fuse_two_keyframes_blends():
    c = simple_camera()
    pts, is_occ, hidden = wall_scene(c)
    n = len(pts)
    img_red = np.zeros((c.height, c.width, 3), np.uint8)
    img_red[..., 0] = 200
    img_blue = np.zeros((c.height, c.width, 3), np.uint8)
    img_blue[..., 2] = 100
    images = jnp.asarray(np.stack([img_red, img_blue]))
    # Two identical camera poses at origin (world == camera frame).
    poses = se3.SE3(
        q=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (2, 1)),
        t=jnp.zeros((2, 3), jnp.float32),
    )
    res = colorize.fuse(
        c,
        jnp.asarray(pts),
        jnp.ones(n, bool),
        images,
        poses,
        se3.identity(),
        downsample_factor=4,
        depth_epsilon=0.25,
    )
    rgb = np.asarray(res.rgb)
    colored = np.asarray(res.colored)
    counts = np.asarray(res.observation_count)
    vis = ~hidden
    assert colored[vis].mean() > 0.95
    assert (counts[vis & colored] == 2).mean() > 0.95
    # Equal scores from both frames -> average of 200 red and 100 blue.
    np.testing.assert_allclose(rgb[colored][:, 0], 100.0, atol=1.0)
    np.testing.assert_allclose(rgb[colored][:, 2], 50.0, atol=1.0)
    # Hidden points got no color.
    assert (~colored[hidden]).all()


def test_fuse_with_masks_tracks_best_label():
    c = simple_camera()
    pts, _, hidden = wall_scene(c)
    n = len(pts)
    img = jnp.asarray(np.zeros((c.height, c.width, 3), np.uint8))
    mask = np.zeros((c.height, c.width), np.int32)
    mask[:, : c.width // 2] = 255
    poses = se3.SE3(q=jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), t=jnp.zeros((1, 3), jnp.float32))
    res = colorize.fuse(
        c,
        jnp.asarray(pts),
        jnp.ones(n, bool),
        img[None],
        poses,
        se3.identity(),
        mask_images=jnp.asarray(mask)[None],
        downsample_factor=4,
        depth_epsilon=0.25,
        with_masks=True,
    )
    labels = np.asarray(res.best_label)
    colored = np.asarray(res.colored)
    px = np.asarray(jax.jit(lambda p: colorize.cam.project(c, p))(jnp.asarray(pts)))
    left = px[:, 0] < c.width // 2
    assert (labels[colored & left] == 255).all()
    assert (labels[colored & ~left] == 0).all()


def test_voxel_downsample_mask():
    pts = jnp.asarray(
        [[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.5, 1.5, 1.5], [2.5, 0.0, 0.0]], jnp.float32
    )
    valid = jnp.ones(4, bool)
    m = np.asarray(voxel.voxel_downsample_mask(pts, valid, voxel_size=1.0))
    # First two share voxel (0,0,0): exactly one survives (the first).
    assert m[0] and not m[1]
    assert m[2] and m[3]


def test_voxel_average():
    pts = jnp.asarray([[0.1, 0, 0], [0.3, 0, 0], [5.0, 5, 5]], jnp.float32)
    vals = jnp.asarray([1.0, 3.0, 10.0], jnp.float32)
    mean_pts, mean_vals, counts = voxel.voxel_average(pts, vals, jnp.ones(3, bool), 1.0, 64)
    nz = np.asarray(counts) > 0
    assert nz.sum() == 2
    got = sorted(np.asarray(mean_vals)[nz].tolist())
    np.testing.assert_allclose(got, [2.0, 10.0])


class TestLocalColorSmoothing:
    def test_inverse_distance_blend(self):
        """smoothColorsWithLocalRegion semantics: IDW average over radius
        neighbors, uncolored points untouched."""
        import jax.numpy as jnp

        from pointcloudprocessor_tpu.ops import fusion

        # Two tight clusters far apart; one outlier-colored point.
        pts = np.array([
            [0, 0, 0], [0.1, 0, 0], [0, 0.1, 0],     # cluster A
            [5, 5, 5], [5.1, 5, 5],                  # cluster B
            [9, 9, 9],                               # isolated, uncolored
        ], np.float32)
        rgb = np.array([
            [255, 0, 0], [0, 255, 0], [0, 0, 255],
            [100, 100, 100], [200, 200, 200],
            [7, 7, 7],
        ], np.float32)
        colored = np.array([True, True, True, True, True, False])
        out = np.asarray(fusion.smooth_colors_local(
            jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(colored), radius=0.5
        ))
        # Cluster A points mix all three colors (each channel 0 < c < 255).
        for i in range(3):
            assert np.all(out[i] > 20) and np.all(out[i] < 235)
        # Cluster B mixes only its two grays.
        assert 100 < out[3].mean() < 200
        # Uncolored point keeps its value.
        np.testing.assert_array_equal(out[5], rgb[5])
        # Weights: self weight 1, neighbor at 0.1 -> 1/1.01; check point 4.
        w_self, w_n = 1.0, 1.0 / (1.0 + 0.1**2)
        expect = (200 * w_self + 100 * w_n) / (w_self + w_n)
        np.testing.assert_allclose(out[4], expect, atol=0.5)

    def test_gaussian_distance_score(self):
        import jax.numpy as jnp

        from pointcloudprocessor_tpu.ops import fusion

        pts = jnp.asarray([[0, 0, 2.0], [0, 0, 4.0]])
        s = np.asarray(fusion.gaussian_distance_score(pts, ideal_distance=2.0, sigma=1.0))
        np.testing.assert_allclose(s[0], 1.0, atol=1e-6)
        np.testing.assert_allclose(s[1], np.exp(-2.0), atol=1e-6)

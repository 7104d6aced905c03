"""Held-out generator families (FIXTURES.md): the trained fixtures must
degrade gracefully, not fall over, on data the training generator never
produced. Marked slow: full sweeps run via tools/fixtures_robustness."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_pose_held_out_families():
    from perception_tpu.models import pose_fixture as PF
    from perception_tpu.models.pose_data import render_people, sample_skeletons

    if not PF.fixture_available():
        pytest.skip("pose fixture missing")
    params = PF.load_fixture()
    hw = PF.FIXTURE_HW

    # Crowding (4 people; trained with <= 2) is the hardest family —
    # FIXTURES.md records recall 0.91 at n=10 scenes, but the 6-scene
    # quick check wobbles to ~0.7 on some seeds; bound it looser.
    for scale, n_people, min_recall in (((0.30, 0.45), 2, 0.8),
                                        ((0.75, 0.92), 2, 0.8),
                                        ((0.45, 0.75), 4, 0.6)):
        keys = jax.random.split(jax.random.key(11), 6)
        scenes = jax.vmap(
            lambda k: sample_skeletons(k, hw, n_people=n_people,
                                       scale_range=scale)
        )(keys)
        images = np.array(jax.vmap(lambda s: render_people(s, hw))(scenes))
        pck, recall = PF.pck_on_images(params, images, scenes)
        assert pck > 0.6, (scale, n_people, pck)
        assert recall > min_recall, (scale, n_people, recall)


def test_pose_noise_degradation_bounded():
    from perception_tpu.models import pose_fixture as PF
    from perception_tpu.models.pose_data import render_people, sample_skeletons

    if not PF.fixture_available():
        pytest.skip("pose fixture missing")
    params = PF.load_fixture()
    hw = PF.FIXTURE_HW
    keys = jax.random.split(jax.random.key(12), 6)
    scenes = jax.vmap(lambda k: sample_skeletons(k, hw))(keys)
    images = np.array(jax.vmap(lambda s: render_people(s, hw))(scenes))
    rng = np.random.RandomState(0)
    noisy = np.clip(images + rng.randn(*images.shape) * 0.15, 0, 1)
    pck, recall = PF.pck_on_images(params, noisy, scenes)
    assert pck > 0.6 and recall > 0.8, (pck, recall)


def test_face_hand_held_out():
    from perception_tpu.models import face_fixture as FF
    from perception_tpu.models import hand_fixture as HF

    if not (FF.fixture_available() and HF.fixture_available()):
        pytest.skip("face/hand fixtures missing")
    fp = FF.load_fixture()
    err, sep, iou = FF.evaluate(fp, jax.random.key(13), n_scenes=8,
                                z_range=(0.75, 0.95))
    assert err < 4.0 and iou > 0.4, (err, iou)
    err_n, _, _ = FF.evaluate(fp, jax.random.key(14), n_scenes=8,
                              pixel_noise=0.10)
    assert err_n < 5.0, err_n

    hp = HF.load_fixture()
    he = HF.evaluate(hp, jax.random.key(15), n_scenes=8, pixel_noise=0.10)
    assert he < 8.0, he

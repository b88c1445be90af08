import numpy as np
import pytest
from PIL import Image

from mvuld_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                       mixup_cutmix, random_erasing,
                                       random_resized_crop, rand_augment,
                                       resize_normalize, train_transform)


@pytest.fixture()
def img():
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8))


def test_resize_normalize(img):
    x = resize_normalize(img, 64)
    assert x.shape == (64, 64, 3)
    # normalization: recover approximate [0,1] range
    back = x * IMAGENET_STD + IMAGENET_MEAN
    assert back.min() > -0.01 and back.max() < 1.01


def test_random_resized_crop_deterministic(img):
    a = random_resized_crop(img, 32, np.random.RandomState(3))
    b = random_resized_crop(img, 32, np.random.RandomState(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.size == (32, 32)


def test_rand_augment_runs(img):
    out = rand_augment(img, np.random.RandomState(0))
    assert out.size == img.size


def test_train_transform_shape(img):
    x = train_transform(img, 48, np.random.RandomState(1))
    assert x.shape == (48, 48, 3)
    assert np.isfinite(x).all()


def test_random_erasing_prob():
    rng = np.random.RandomState(0)
    x = np.zeros((32, 32, 3), np.float32)
    out = random_erasing(x.copy(), rng, prob=1.0)
    assert (out != 0).any()           # something was erased with noise
    out2 = random_erasing(x.copy(), np.random.RandomState(1), prob=0.0)
    assert (out2 == 0).all()


def test_mixup_cutmix_soft_targets():
    rng = np.random.RandomState(0)
    imgs = rng.rand(8, 16, 16, 3).astype(np.float32)
    labels = np.array([0, 1] * 4, np.int32)
    out, soft = mixup_cutmix(imgs, labels, 2, rng, mixup_alpha=0.8,
                             cutmix_alpha=1.0, label_smoothing=0.1)
    assert out.shape == imgs.shape
    assert soft.shape == (8, 2)
    np.testing.assert_allclose(soft.sum(-1), np.ones(8), atol=1e-5)
    assert (soft > 0).all()           # smoothing keeps both classes positive

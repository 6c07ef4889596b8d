"""Projections + linear algebra (reference test analogs: src/projection/*
inline tests, src/utils/linear_algebra.rs tests)."""

import numpy as np
import pytest

from scann_tpu import ScannError
from scann_tpu.projection import (
    ChunkingConfig,
    ChunkingProjection,
    IdentityProjection,
    OpqConfig,
    OpqProjection,
    PcaProjection,
    ProjectionFactory,
    RandomGaussianProjection,
    RandomOrthogonalProjection,
    TruncateProjection,
)
from scann_tpu.utils.linear_algebra import (
    fit_pca,
    gram_schmidt,
    random_orthogonal_matrix,
    symmetric_eigen,
)


def test_identity():
    p = IdentityProjection(4)
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    np.testing.assert_array_equal(p.project(x), x)
    np.testing.assert_array_equal(p.inverse_project(x), x)
    with pytest.raises(ScannError):
        p.project(np.zeros((2, 5), np.float32))


def test_random_orthogonal_matrix_properties():
    q = random_orthogonal_matrix(16, seed=1)
    np.testing.assert_allclose(q @ q.T, np.eye(16), atol=1e-4)
    q2 = random_orthogonal_matrix(16, seed=1)
    np.testing.assert_allclose(q, q2)  # deterministic
    q3 = random_orthogonal_matrix(16, seed=2)
    assert not np.allclose(q, q3)


def test_random_orthogonal_projection_preserves_distances(rng):
    p = RandomOrthogonalProjection(32, 32, seed=3)
    x = rng.normal(size=(10, 32)).astype(np.float32)
    y = p.project(x)
    dx = ((x[:1] - x) ** 2).sum(-1)
    dy = ((y[:1] - y) ** 2).sum(-1)
    np.testing.assert_allclose(dx, dy, rtol=1e-3)
    # inverse round trip
    np.testing.assert_allclose(p.inverse_project(y), x, atol=1e-3)


def test_random_gaussian_projection_jl(rng):
    p = RandomGaussianProjection(64, 32, seed=0)
    x = rng.normal(size=(5, 64)).astype(np.float32)
    assert p.project(x).shape == (5, 32)


def test_pca_recovers_dominant_axes(rng):
    # data with variance concentrated in 2 dims
    base = rng.normal(size=(500, 2)).astype(np.float32) * np.array([10.0, 5.0])
    noise = rng.normal(size=(500, 6)).astype(np.float32) * 0.1
    x = np.concatenate([base, noise], axis=1).astype(np.float32)
    p = PcaProjection(8, 2).train(x)
    assert p.explained_variance_ratio().sum() > 0.98
    y = p.project(x)
    assert y.shape == (500, 2)
    # inverse reconstructs the dominant structure
    rec = p.inverse_project(y)
    assert ((rec - x) ** 2).mean() < 0.05


def test_pca_result_fields(rng):
    x = rng.normal(size=(100, 6)).astype(np.float32)
    r = fit_pca(x, 3)
    assert r.components.shape == (3, 6)
    assert r.explained_variance.shape == (3,)
    assert (np.diff(r.explained_variance) <= 1e-5).all()  # descending
    with pytest.raises(ScannError):
        fit_pca(x, 10)


def test_symmetric_eigen():
    a = np.array([[2.0, 1.0], [1.0, 2.0]], dtype=np.float32)
    w, v = symmetric_eigen(a)
    np.testing.assert_allclose(w, [3.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(a @ v[:, 0], w[0] * v[:, 0], atol=1e-4)


def test_gram_schmidt(rng):
    v = rng.normal(size=(4, 8)).astype(np.float32)
    q = gram_schmidt(v)
    np.testing.assert_allclose(q @ q.T, np.eye(4), atol=1e-5)


def test_opq_rotation_orthogonal(rng):
    x = rng.normal(size=(300, 16)).astype(np.float32)
    p = OpqProjection(OpqConfig(dim=16, num_subspaces=4, num_iterations=3, seed=0)).train(x)
    r = p.rotation
    np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-3)
    y = p.project(x)
    # rotation preserves norms
    np.testing.assert_allclose((y ** 2).sum(-1), (x ** 2).sum(-1), rtol=1e-3)
    np.testing.assert_allclose(p.inverse_project(y), x, atol=1e-3)


def test_truncate():
    p = TruncateProjection(6, 3, offset=1)
    x = np.arange(6, dtype=np.float32)[None, :]
    np.testing.assert_array_equal(p.project(x)[0], [1, 2, 3])
    inv = p.inverse_project(p.project(x))
    np.testing.assert_array_equal(inv[0], [0, 1, 2, 3, 0, 0])
    with pytest.raises(ScannError):
        TruncateProjection(4, 3, offset=2)


def test_chunking(rng):
    cfg = ChunkingConfig(input_dim=12, num_chunks=3)
    p = ChunkingProjection(cfg)
    assert p.output_dim == 12
    x = rng.normal(size=(4, 12)).astype(np.float32)
    chunks = p.chunks(x)
    assert len(chunks) == 3 and chunks[0].shape == (4, 4)
    np.testing.assert_array_equal(p.project(x), x)
    # per-chunk projection
    p.set_chunk_projection(1, TruncateProjection(4, 2))
    assert p.output_dim == 10
    y = p.project(x)
    np.testing.assert_array_equal(y[:, 4:6], x[:, 4:6])
    with pytest.raises(ScannError):
        ChunkingConfig(input_dim=10, num_chunks=3)


def test_factory():
    assert ProjectionFactory.create("identity", dim=4).output_dim == 4
    assert ProjectionFactory.create("truncate", input_dim=8, output_dim=2).output_dim == 2
    assert ProjectionFactory.create(
        "random_orthogonal", input_dim=8, output_dim=4).output_dim == 4
    with pytest.raises(ScannError):
        ProjectionFactory.create("bogus")


def test_truncate_rejects_negative_offset():
    import pytest

    from scann_tpu.errors import ScannError
    from scann_tpu.projection.truncate import TruncateProjection

    with pytest.raises(ScannError):
        TruncateProjection(input_dim=8, output_dim=4, offset=-4)


def test_random_orthogonal_rejects_expanding_output():
    import pytest

    from scann_tpu.errors import ScannError
    from scann_tpu.projection.random import RandomOrthogonalProjection

    with pytest.raises(ScannError):
        RandomOrthogonalProjection(input_dim=4, output_dim=8)


def test_chunking_with_projection_is_honored():
    """ChunkingConfig.with_projection installs real per-chunk projections
    (previously a dead config flag)."""
    import numpy as np

    from scann_tpu.projection.chunking import ChunkingConfig, ChunkingProjection

    cfg = ChunkingConfig(input_dim=16, num_chunks=4).with_projection(2)
    proj = ChunkingProjection(cfg)
    assert proj.output_dim == 8
    x = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    y = proj.project(x)
    assert y.shape == (5, 8)
    # orthogonal per-chunk projections preserve chunk norms
    xc = x.reshape(5, 4, 4)
    yc = y.reshape(5, 4, 2)
    assert not np.allclose(np.linalg.norm(xc, axis=-1) ** 2,
                           np.linalg.norm(yc, axis=-1) ** 2)  # dim reduced

"""EnsembleEngine: fused multi-group program vs per-group engines."""

import numpy as np
import pytest

from tests.model_fixtures import make_dataset_json, make_plans
from tests.torch_mirror import TorchPlainConvUNet, make_spec as tspec
from totalsegmentator2d_tpu.inference import EnsembleEngine, InferenceEngine
from totalsegmentator2d_tpu.models.convert import state_dict_to_params
from totalsegmentator2d_tpu.models.plans import parse_model_spec
from totalsegmentator2d_tpu.models.unet import init_params_np


@pytest.fixture(scope='module')
def groups():
    import torch
    plans = make_plans(patch=(64, 64))
    label_sets = [('heart', 'aorta'), ('rib-1', 'rib-2', 'rib-3')]
    specs, params = [], []
    for i, labels in enumerate(label_sets):
        ds = make_dataset_json(labels)
        spec = parse_model_spec(plans, ds)
        torch.manual_seed(10 + i)
        net = TorchPlainConvUNet(tspec(in_channels=2, out_channels=len(labels)))
        p = state_dict_to_params(
            {k: v.numpy() for k, v in net.state_dict().items()}, spec.arch)
        specs.append(spec)
        params.append([p])
    return specs, params


@pytest.fixture
def bitwise_stats(monkeypatch):
    """Force two-pass InstanceNorm statistics on every program. The
    batched/bucket serving programs default to one-pass stats (a ~1e-6
    logit drift that can flip borderline pixels — pinned in
    TestOnePassServingDefault); tests that assert BITWISE equality between
    a batched engine and the solo exact program pin the dispatch
    *mechanics* (ordering, padding, co-batching), so they pin the
    statistics form instead of weakening to an agreement threshold."""
    monkeypatch.setenv('TS2D_STATS', '2pass')


class TestEnsembleEngine:
    def test_matches_individual_engines(self, groups, rng):
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        arr = (rng.standard_normal((80, 70, 2)) + 2.0).astype(np.float32)
        merged = ens.predict_array(arr, (1.5, 1.5))
        assert merged.shape == (80, 70, 5)

        singles = []
        for spec, p in zip(specs, params):
            eng = InferenceEngine(spec, p)
            singles.append(eng.predict_array(arr, (1.5, 1.5)))
        ref = np.concatenate(singles, axis=-1)
        # hard decisions must agree except where |p-0.5| is at fp noise level
        agree = (merged == ref).mean()
        assert agree > 0.9999, f'agreement {agree}'

    def test_labels_map(self, groups):
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        labels = ens.labels()
        assert labels == {1: 'heart', 2: 'aorta', 3: 'rib-1', 4: 'rib-2',
                          5: 'rib-3'}
        assert ens.total_labels == 5

    def test_noncontiguous_labels_rejected(self, groups):
        """The fused merge maps channel i <-> value i+1; a dataset.json with
        gaps in the label values must fail loudly, not mislabel channels."""
        import dataclasses
        specs, params = groups
        bad = dataclasses.replace(specs[0],
                                  labels={1: 'heart', 3: 'aorta'})
        with pytest.raises(ValueError, match='contiguous'):
            EnsembleEngine([bad, specs[1]], params)

    def test_mismatched_preprocess_rejected(self, groups):
        specs, params = groups
        import dataclasses
        bad = dataclasses.replace(specs[1], preprocess=dataclasses.replace(
            specs[1].preprocess, spacing=(2.0, 2.0)))
        with pytest.raises(ValueError):
            EnsembleEngine([specs[0], bad], params)

    def test_resampled_input(self, groups, rng):
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        arr = (rng.standard_normal((40, 30, 2)) + 2.0).astype(np.float32)
        merged = ens.predict_array(arr, (3.0, 3.0))
        assert merged.shape == (40, 30, 5)


class TestNumpyInit:
    pytestmark = pytest.mark.slow
    def test_layout_matches_jax_init(self):
        import jax
        from totalsegmentator2d_tpu.models.unet import init_params
        from __graft_entry__ import _flagship_spec
        spec = _flagship_spec(out_channels=4, in_channels=2, n_stages=3)
        a = init_params(jax.random.PRNGKey(0), spec)
        b = init_params_np(0, spec)
        sa = jax.tree_util.tree_map(lambda x: x.shape, a)
        sb = jax.tree_util.tree_map(lambda x: x.shape, b)
        assert sa == sb
        # norm scales must be ones, biases zero
        blk = b['encoder']['stages'][0][0]
        assert np.all(blk['norm']['scale'] == 1.0)
        assert np.all(blk['conv']['b'] == 0.0)
        assert blk['conv']['w'].std() > 0


class TestAsyncAndPallas:
    def test_predict_volume_async_matches_sync(self, groups, rng):
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        vol = (rng.standard_normal((40, 20, 30)) * 100).astype(np.float32)
        seg_s, proj_s = ens.predict_volume(vol, (1.5, 1.5), ('max', 'mean'))
        handle = ens.predict_volume_async(vol, (1.5, 1.5), ('max', 'mean'))
        seg_a, proj_a = ens.finish_volume(handle)
        np.testing.assert_array_equal(seg_a, seg_s)
        np.testing.assert_array_equal(proj_a, proj_s)

    def test_predict_array_async_matches_sync(self, groups, rng):
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        arr = np.zeros((90, 80, 2), np.float32)
        arr[10:70, 5:60] = (rng.standard_normal((60, 55, 2)) + 2)
        sync = ens.predict_array(arr, (1.5, 1.5))
        handles = [ens.predict_array_async(arr, (1.5, 1.5)) for _ in range(3)]
        for h in handles:
            np.testing.assert_array_equal(ens.finish_array(h), sync)

    def test_volume_crop_matches_host_projection(self, groups, rng):
        """Zero-background volume: the fused volume path (host bbox crop)
        equals the host-projection 2D path (exact nnU-Net crop)."""
        from totalsegmentator2d_tpu.ops.projection import project_array_np
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        vol = np.zeros((60, 30, 50), np.float32)
        vol[10:50, 5:25, 8:40] = \
            rng.standard_normal((40, 20, 32)) * 100 + 50
        seg_vol, proj_vol = ens.predict_volume(vol, (1.5, 1.5),
                                               ('max', 'mean'))
        proj = np.concatenate([project_array_np(vol, 'max', 1),
                               project_array_np(vol, 'mean', 1)],
                              axis=1).transpose(0, 2, 1)
        seg_2d = ens.predict_array(np.ascontiguousarray(proj, np.float32),
                                   (1.5, 1.5))
        assert seg_vol.shape == seg_2d.shape
        assert (seg_vol == seg_2d).mean() > 0.9999
        np.testing.assert_allclose(proj_vol, proj.astype(np.float32),
                                   rtol=1e-5, atol=1e-4)

    def test_pack_unpack_roundtrip(self, rng):
        import jax.numpy as jnp
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            _pack_bits, unpack_bits)
        bits = (rng.random((7, 9, 117)) > 0.5).astype(np.uint8)
        packed = np.asarray(_pack_bits(jnp.asarray(bits)))
        assert packed.shape == (7, 9, 15)
        np.testing.assert_array_equal(unpack_bits(packed, 117), bits)

    @pytest.mark.slow
    def test_pallas_flag_cpu_fallback(self, groups, rng, monkeypatch):
        """The default-on Pallas prefilter falls back to the jnp path on
        CPU (kernel returns None): disabled vs enabled results match on a
        resampling input."""
        specs, params = groups
        monkeypatch.setenv('TS2D_PALLAS', '0')
        ens = EnsembleEngine(specs, params)
        arr = (rng.standard_normal((64, 64, 2)) + 2).astype(np.float32)
        seg = ens.predict_array(arr, (3.0, 3.0))
        monkeypatch.delenv('TS2D_PALLAS')
        ens2 = EnsembleEngine(specs, params)
        ref = ens2.predict_array(arr, (3.0, 3.0))
        np.testing.assert_array_equal(seg, ref)


class TestCohort:
    pytestmark = pytest.mark.slow
    def test_cohort_matches_single(self, groups, rng):
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        vols = (rng.standard_normal((3, 40, 20, 30)) * 100).astype(np.float32)
        batch = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'))
        assert batch.shape == (3, 40, 30, 5)
        for i in range(3):
            single, _ = ens.predict_volume(vols[i], (1.5, 1.5), ('max', 'mean'))
            np.testing.assert_array_equal(batch[i], single)

    def test_cohort_mixed_shapes(self, groups, rng):
        """Heterogeneous cohort: 3 distinct volume shapes bucket + pad onto
        the 8-device mesh and reproduce the homogeneous-batch results."""
        from totalsegmentator2d_tpu.parallel import make_mesh
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        mesh = make_mesh({'data': 8})
        shapes = [(40, 20, 30), (32, 16, 24), (36, 18, 28),
                  (40, 20, 30), (32, 16, 24)]
        vols = [(rng.standard_normal(s) * 100 + 40).astype(np.float32)
                for s in shapes]
        mixed = ens.predict_cohort_mixed(vols, (1.5, 1.5), ('max', 'mean'),
                                         mesh=mesh)
        assert len(mixed) == len(vols)
        for v, m in zip(vols, mixed):
            solo = ens.predict_cohort(v[None], (1.5, 1.5), ('max', 'mean'))[0]
            assert m.shape == solo.shape
            assert (m == solo).mean() > 0.9999

    def test_cohort_mixed_padded_bucketing(self, groups, rng):
        """bucket='pad': a 5-scan cohort of 3 distinct shapes coalesces
        into ONE padded batch program (>=4-way batching over the 8-device
        mesh) and agrees with exact mode everywhere except the documented
        z-score-statistics delta."""
        from totalsegmentator2d_tpu.parallel import make_mesh
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        mesh = make_mesh({'data': 8})
        shapes = [(40, 20, 30), (32, 16, 24), (36, 18, 28),
                  (40, 20, 30), (32, 16, 24)]
        vols = [(rng.standard_normal(s) * 100 + 40).astype(np.float32)
                for s in shapes]
        padded = ens.predict_cohort_mixed(vols, (1.5, 1.5), ('max', 'mean'),
                                          mesh=mesh, bucket='pad',
                                          pad_quantum=64)
        # every shape quantizes to (64, 64, 64): one bucket, one program
        pad_keys = [k for k in ens._cache if k[0] == 'cohortpad']
        assert len(pad_keys) == 1
        assert pad_keys[0][1] == (8, 64, 64, 64)  # 5 scans padded to mesh
        exact = ens.predict_cohort_mixed(vols, (1.5, 1.5), ('max', 'mean'))
        for v, p, e in zip(vols, padded, exact):
            assert p.shape == e.shape == (v.shape[0], v.shape[2], 5)
            # the only deviation left is the tile grid seeing the padded
            # extent (stats are masked, placement centered): measured
            # ~99.9% at plan spacing on synthetic borderline weights
            assert (p == e).mean() > 0.99, (p == e).mean()

    def test_cohort_mixed_padded_mip_mean_masking(self, groups, rng):
        """Negative-valued volumes: zero padding must NOT leak into the MIP
        (zero would beat negative HU) or the AIP denominator. With
        pad_quantum=1 the bucket shape equals each scan's true shape, so
        pad mode must match exact mode bit-for-bit."""
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        vols = [(rng.standard_normal((40, 20, 30)) * 100 - 300)
                .astype(np.float32),
                (rng.standard_normal((32, 16, 24)) * 100 - 300)
                .astype(np.float32)]
        padded = ens.predict_cohort_mixed(vols, (1.5, 1.5), ('max', 'mean'),
                                          bucket='pad', pad_quantum=1)
        exact = ens.predict_cohort_mixed(vols, (1.5, 1.5), ('max', 'mean'))
        for p, e in zip(padded, exact):
            np.testing.assert_array_equal(p, e)

    def test_cohort_mixed_pad_rejects_unsupported_mode(self, groups, rng):
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        vols = [(rng.standard_normal((16, 8, 8))).astype(np.float32)]
        with pytest.raises(ValueError, match="bucket='pad' supports"):
            ens.predict_cohort_mixed(vols, (1.5, 1.5), ('std',),
                                     bucket='pad')

    def test_cohort_batch_padding(self, groups, rng):
        """N not divisible by the mesh data axis pads internally."""
        from totalsegmentator2d_tpu.parallel import make_mesh
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        mesh = make_mesh({'data': 4})
        vols = (rng.standard_normal((3, 40, 20, 30)) * 100).astype(np.float32)
        sharded = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'),
                                     mesh=mesh)
        plain = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'))
        assert sharded.shape == plain.shape
        np.testing.assert_array_equal(sharded, plain)

    def test_cohort_program_cache_survives_mesh_gc(self, groups, rng):
        """The cohort program cache must key on a GC-stable mesh identity,
        not id(mesh): a new mesh allocated after the old one died must map
        to a key derived from its axes/devices, so equal meshes share one
        program and a different mesh can never alias a dead one's entry."""
        import gc
        from totalsegmentator2d_tpu.parallel import make_mesh
        from totalsegmentator2d_tpu.inference.ensemble_engine import _mesh_key
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        vols = (rng.standard_normal((4, 40, 20, 30)) * 100).astype(np.float32)

        mesh = make_mesh({'data': 4})
        first = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'),
                                   mesh=mesh)
        key_a = _mesh_key(mesh)
        del mesh
        gc.collect()
        mesh2 = make_mesh({'data': 4})
        # identical topology -> identical key: the cached program's
        # NamedShardings are valid for any equal mesh, and no id() reuse
        # can produce a spurious hit for a *different* topology
        assert _mesh_key(mesh2) == key_a
        assert _mesh_key(make_mesh({'data': 2})) != key_a
        again = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'),
                                   mesh=mesh2)
        np.testing.assert_array_equal(first, again)
        cohort_keys = [k for k in ens._cache if k[0] == 'cohort']
        assert len(cohort_keys) == 1 and cohort_keys[0][-1] == key_a

    def test_cohort_data_parallel_mesh(self, groups, rng):
        from totalsegmentator2d_tpu.parallel import make_mesh
        specs, params = groups
        ens = EnsembleEngine(specs, params)
        mesh = make_mesh({'data': 8})
        vols = (rng.standard_normal((8, 40, 20, 30)) * 100).astype(np.float32)
        sharded = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'),
                                     mesh=mesh)
        plain = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'))
        np.testing.assert_array_equal(sharded, plain)


class TestSpatialTileSharding:
    pytestmark = pytest.mark.slow
    def test_tile_sharded_matches_unsharded(self, groups, rng):
        """Tile grid split over a 4-device mesh axis + psum accumulate must
        reproduce the single-device result exactly."""
        from totalsegmentator2d_tpu.parallel import make_mesh
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        mesh = make_mesh({'data': 4})
        sharded = EnsembleEngine(specs, params, tile_mesh=mesh)
        # big enough for a multi-tile grid with patch 64
        arr = (rng.standard_normal((150, 130, 2)) + 2).astype(np.float32)
        a = plain.predict_array(arr, (1.5, 1.5))
        b = sharded.predict_array(arr, (1.5, 1.5))
        assert (a == b).mean() > 0.9999

    def test_tile_count_not_divisible(self, groups, rng):
        """Padding tiles (valid=0) must not perturb results when T % D != 0."""
        from totalsegmentator2d_tpu.parallel import make_mesh
        from totalsegmentator2d_tpu.inference.tiling import tile_positions
        specs, params = groups
        mesh = make_mesh({'data': 8})
        sharded = EnsembleEngine(specs, params, tile_mesh=mesh)
        plain = EnsembleEngine(specs, params)
        arr = (rng.standard_normal((100, 90, 2)) + 2).astype(np.float32)
        a = plain.predict_array(arr, (1.5, 1.5))
        b = sharded.predict_array(arr, (1.5, 1.5))
        assert (a == b).mean() > 0.9999


@pytest.mark.usefixtures('bitwise_stats')
class TestDynamicBatching:
    pytestmark = pytest.mark.slow
    def test_batched_matches_unbatched(self, groups, rng):
        """Concurrent same-shape requests coalesce into one batched dispatch
        (including padding: 5 requests, max_batch=4 -> batches of <=4) and
        reproduce the unbatched engine's output exactly."""
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            arrs = [(rng.standard_normal((80, 70, 2)) + 2).astype(np.float32)
                    for _ in range(5)]
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in arrs]
            for a, h in zip(arrs, handles):
                ref = plain.predict_array(a, (1.5, 1.5))
                np.testing.assert_array_equal(batched.finish_array(h), ref)
        finally:
            batched.close()

    def test_single_request_passthrough(self, groups, rng):
        """A lone request goes through the single-scan program (no batch
        padding waste) and still matches."""
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=8)
        try:
            arr = np.zeros((90, 80, 2), np.float32)
            arr[10:70, 5:60] = (rng.standard_normal((60, 55, 2)) + 2)
            out = batched.predict_array(arr, (1.5, 1.5))
            np.testing.assert_array_equal(
                out, plain.predict_array(arr, (1.5, 1.5)))
        finally:
            batched.close()

    def test_mixed_shapes_bucket_separately(self, groups, rng):
        """Interleaved requests of different shapes must not be stacked
        together — each shape batches with its own kind."""
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            shapes = [(80, 70), (64, 64), (80, 70), (64, 64), (80, 70)]
            arrs = [(rng.standard_normal(s + (2,)) + 2).astype(np.float32)
                    for s in shapes]
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in arrs]
            for a, h in zip(arrs, handles):
                ref = plain.predict_array(a, (1.5, 1.5))
                np.testing.assert_array_equal(batched.finish_array(h), ref)
        finally:
            batched.close()

    def test_masked_norm_through_batcher(self, groups, rng):
        """Masked-normalization plans route their host-computed hole-filled
        masks through the batched dispatch."""
        import dataclasses
        specs, params = groups
        specs_m = [dataclasses.replace(
            s, preprocess=dataclasses.replace(
                s.preprocess, use_mask_for_norm=(True, True)))
            for s in specs]
        plain = EnsembleEngine(specs_m, params)
        batched = EnsembleEngine(specs_m, params, auto_batch=4)
        try:
            arrs = []
            for _ in range(3):
                a = np.zeros((80, 70, 2), np.float32)
                a[10:60, 8:55] = rng.standard_normal((50, 47, 2)) + 3
                arrs.append(a)
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in arrs]
            for a, h in zip(arrs, handles):
                ref = plain.predict_array(a, (1.5, 1.5))
                np.testing.assert_array_equal(batched.finish_array(h), ref)
        finally:
            batched.close()

    def test_close_stops_dispatcher(self, groups):
        specs, params = groups
        batched = EnsembleEngine(specs, params, auto_batch=2)
        batched.close()
        assert batched._batcher is None

    def test_linger_fills_batches(self, groups, rng):
        """With linger, requests submitted in quick succession ride one
        full batch and still match the unbatched engine."""
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            batched.set_batch_linger(100.0)
            arrs = [(rng.standard_normal((64, 64, 2)) + 2).astype(np.float32)
                    for _ in range(4)]
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in arrs]
            for a, h in zip(arrs, handles):
                np.testing.assert_array_equal(
                    batched.finish_array(h),
                    plain.predict_array(a, (1.5, 1.5)))
            batched.set_batch_linger(0.0)
        finally:
            batched.close()

    def test_linger_requires_batcher(self, groups):
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        with pytest.raises(RuntimeError, match='micro-batching'):
            plain.set_batch_linger(10.0)

    def test_auto_batch_rejects_tile_mesh(self, groups):
        """The batcher vmaps the program; the tile-sharded program is a
        shard_map — incompatible ways to fill the device."""
        from totalsegmentator2d_tpu.parallel import make_mesh
        specs, params = groups
        with pytest.raises(ValueError, match='auto_batch'):
            EnsembleEngine(specs, params, tile_mesh=make_mesh({'data': 4}),
                           auto_batch=4)

    def test_dispatch_error_propagates(self, groups, rng, monkeypatch):
        """A failing dispatch must surface on every waiting future, not
        hang the callers."""
        specs, params = groups
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            monkeypatch.setattr(
                batched._batcher, '_dispatch',
                lambda key, take: (_ for _ in ()).throw(
                    RuntimeError('boom')))
            h = batched.predict_array_async(
                (rng.standard_normal((64, 64, 2)) + 2).astype(np.float32),
                (1.5, 1.5))
            with pytest.raises(RuntimeError, match='boom'):
                batched.finish_array(h)
        finally:
            batched.close()

    def test_dead_dispatcher_restarts_on_submit(self, groups, rng):
        """A dispatcher thread that died of an internal error restarts on
        the next submit and serves it (elastic recovery; crash-loop cap and
        counter semantics in tests/test_020_batching.py) — a future must
        never be left unresolvable."""
        specs, params = groups
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            b = batched._batcher
            # stop the thread without marking the batcher user-stopped
            with b._cv:
                b._stopped = True
                b._cv.notify()
            b._thread.join(timeout=5)
            b._stopped = False
            arr = (rng.standard_normal((64, 64, 2)) + 2).astype(np.float32)
            seg = batched.predict_array(arr, (1.5, 1.5))
            assert seg.shape == (64, 64, 5)
            assert b._thread.is_alive()
        finally:
            batched.close()

    def test_linger_with_mixed_shapes_resolves(self, groups, rng):
        """Linger counts the oldest request's own (shape) key — unrelated
        shapes must neither extend nor break its batch; everything
        resolves correctly."""
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=2)
        try:
            batched.set_batch_linger(60.0)
            shapes = [(64, 64), (80, 70), (64, 64), (80, 70)]
            arrs = [(rng.standard_normal(s + (2,)) + 2).astype(np.float32)
                    for s in shapes]
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in arrs]
            for a, h in zip(arrs, handles):
                np.testing.assert_array_equal(
                    batched.finish_array(h),
                    plain.predict_array(a, (1.5, 1.5)))
        finally:
            batched.close()

    @pytest.mark.parametrize('masked', [False, True])
    def test_warmup_compiles_batched_program(self, groups, masked):
        """warmup on a batching engine must also compile the batched
        program (jit is lazy — the first concurrent burst would otherwise
        pay the cold compile), including the masked-norm variant (stacked
        hole-filled dummy masks)."""
        import dataclasses
        specs, params = groups
        if masked:
            specs = [dataclasses.replace(
                sp, preprocess=dataclasses.replace(
                    sp.preprocess, use_mask_for_norm=(True, True)))
                for sp in specs]
        eng = EnsembleEngine(specs, params, auto_batch=2)
        try:
            eng.warmup((64, 64))
            key = ('batch', 2, (64, 64),
                   tuple(round(float(s), 6) for s in (1.5, 1.5)), masked,
                   None, False)
            assert key in eng._cache
        finally:
            eng.close()


class TestCohortMaskedNorm:
    pytestmark = pytest.mark.slow
    def test_masked_cohort_exact(self, groups, rng):
        """Masked-norm cohorts now run the exact hole-filled host-mask
        path: results must equal per-volume predict_volume."""
        import dataclasses
        specs, params = groups
        specs_m = [dataclasses.replace(
            s, preprocess=dataclasses.replace(
                s.preprocess, use_mask_for_norm=(True, True)))
            for s in specs]
        ens = EnsembleEngine(specs_m, params)
        vols = np.zeros((3, 40, 20, 30), np.float32)
        vols[:, 8:36, 4:16, 6:26] = \
            rng.standard_normal((3, 28, 12, 20)) * 100 + 60
        batch = ens.predict_cohort(vols, (1.5, 1.5), ('max', 'mean'))
        assert batch.shape == (3, 40, 30, 5)
        for i in range(3):
            solo, _ = ens.predict_volume(vols[i], (1.5, 1.5),
                                         ('max', 'mean'))
            np.testing.assert_array_equal(batch[i], solo)

    @pytest.mark.usefixtures('bitwise_stats')
    def test_cancelled_request_does_not_poison_batch(self, groups, rng):
        """A caller that cancels its future must neither get a result nor
        fail its co-batched siblings."""
        import concurrent.futures
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=2)
        try:
            batched.set_batch_linger(500.0)  # hold the batch open
            arr = (rng.standard_normal((64, 64, 2)) + 2).astype(np.float32)
            h_cancel = batched.predict_array_async(arr, (1.5, 1.5))
            assert h_cancel[1].cancel()  # still pending: cancel succeeds
            h_live = batched.predict_array_async(arr, (1.5, 1.5))
            np.testing.assert_array_equal(
                batched.finish_array(h_live),
                plain.predict_array(arr, (1.5, 1.5)))
            with pytest.raises(concurrent.futures.CancelledError):
                batched.finish_array(h_cancel)
            batched.set_batch_linger(0.0)
        finally:
            batched.close()


@pytest.mark.usefixtures('bitwise_stats')
class TestInt16Wire:
    pytestmark = pytest.mark.slow
    """Exactly-integral channels (CT MIP, integer X-rays) upload as int16 —
    half the wire bytes on remote-attached TPUs (probe12: the 8-scan
    stacked upload A/Bs 160 -> 125 ms) with BIT-IDENTICAL results (the
    device casts back to float before normalization)."""

    def test_wire_detect(self, rng):
        from totalsegmentator2d_tpu.inference.ensemble_engine import \
            wire_detect
        integral = rng.integers(-1024, 3072, (6, 5)).astype(np.float32)
        frac = integral + 0.5
        big = integral + 40000.0          # exceeds int16
        nan = integral.copy()
        nan[0, 0] = np.nan
        arr = np.stack([integral, frac, big, nan], axis=-1)
        assert wire_detect(arr) == (True, False, False, False)

    def test_wire_pack_restore_roundtrip(self, rng):
        """Channel order survives the split even when a float channel
        precedes an int channel (non-identity permutation)."""
        import jax
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            _wire_pack, _wire_restore)
        frac = (rng.standard_normal((4, 3)) * 10).astype(np.float32)
        ints = rng.integers(-100, 100, (4, 3)).astype(np.float32)
        arr = np.stack([frac, ints], axis=-1)
        wire = (False, True)
        restored = np.asarray(jax.jit(
            lambda p: _wire_restore(p, wire, np.float32))(
                _wire_pack(arr, wire)))
        np.testing.assert_array_equal(restored, arr)
        # all-int wire: single-element payload
        wire2 = (True, True)
        arr2 = np.stack([ints, ints + 1], axis=-1)
        payload = _wire_pack(arr2, wire2)
        assert isinstance(payload, tuple) and len(payload) == 1
        restored2 = np.asarray(jax.jit(
            lambda p: _wire_restore(p, wire2, np.float32))(payload))
        np.testing.assert_array_equal(restored2, arr2)

    def test_integral_input_matches_float_wire(self, groups, rng,
                                               monkeypatch):
        """A CT-like (integral MIP, fractional AIP) input rides the
        (int16, f32) wire and must equal the plain-f32-wire result
        bitwise."""
        import totalsegmentator2d_tpu.inference.ensemble_engine as ee
        specs, params = groups
        eng = EnsembleEngine(specs, params)
        mip = rng.integers(-1024, 3072, (80, 70)).astype(np.float32)
        aip = (rng.standard_normal((80, 70)) * 100 + 30).astype(np.float32)
        arr = np.stack([mip, aip], axis=-1)
        out_wire = eng.predict_array(arr, (1.5, 1.5))
        monkeypatch.setattr(ee, 'wire_detect',
                            lambda a: (False,) * a.shape[-1])
        out_plain = eng.predict_array(arr, (1.5, 1.5))
        np.testing.assert_array_equal(out_wire, out_plain)

    def test_wire_through_batcher(self, groups, rng):
        """Concurrent integral scans coalesce on the int16 wire and match
        the plain engine."""
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            arrs = []
            for i in range(3):
                mip = rng.integers(-500, 2000, (64, 60)).astype(np.float32)
                aip = (rng.standard_normal((64, 60)) * 50).astype(np.float32)
                arrs.append(np.stack([mip, aip], axis=-1))
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in arrs]
            for a, h in zip(arrs, handles):
                np.testing.assert_array_equal(
                    batched.finish_array(h),
                    plain.predict_array(a, (1.5, 1.5)))
        finally:
            batched.close()

    def test_mixed_wires_do_not_cobatch(self, groups, rng):
        """Same-shape scans on different wires run different programs; the
        batcher must keep them apart (and both must still be right)."""
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            mip = rng.integers(-500, 2000, (64, 60)).astype(np.float32)
            aip = (rng.standard_normal((64, 60)) * 50).astype(np.float32)
            a_int = np.stack([mip, aip], axis=-1)      # wire (T, F)
            a_flt = a_int + 0.25                       # wire (F, F)
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in (a_int, a_flt, a_int, a_flt)]
            for a, h in zip((a_int, a_flt, a_int, a_flt), handles):
                np.testing.assert_array_equal(
                    batched.finish_array(h),
                    plain.predict_array(a, (1.5, 1.5)))
        finally:
            batched.close()

    def test_warmup_wire_variant(self, groups):
        """warmup(wire=...) pre-compiles the int16-wire programs (solo and
        batched) and validates the flag count."""
        specs, params = groups
        eng = EnsembleEngine(specs, params, auto_batch=2)
        try:
            eng.warmup((64, 64), (1.5, 1.5), wire=(True, False))
            keys = list(eng._cache)
            assert ((64, 64), (1.5, 1.5), (True, False)) in keys
            assert ('batch', 2, (64, 64), (1.5, 1.5), False,
                    (True, False), False) in keys
            with pytest.raises(ValueError, match='channel flags'):
                eng.warmup((64, 64), (1.5, 1.5), wire=(True,))
        finally:
            eng.close()


class TestPadQuantumServing:
    pytestmark = pytest.mark.slow
    """Quantized-shape serving (pad_quantum): arbitrary cropped sizes share
    ONE geometry-as-data bucket program — the scan's true extent rides in
    as data and reproduces exact-mode tile layout, symmetric padding, and
    per-scan resample matrices, so results match the exact per-shape
    program up to float-noise borderline flips."""

    def test_shapes_share_one_program_and_match_exact(self, groups, rng):
        specs, params = groups
        exact = EnsembleEngine(specs, params)
        padded = EnsembleEngine(specs, params, pad_quantum=32)
        # 70x60 and 90x50 both quantize to the (96, 64) bucket
        a = (rng.standard_normal((70, 60, 2)) + 2.0).astype(np.float32)
        b = (rng.standard_normal((90, 50, 2)) + 2.0).astype(np.float32)
        sa = padded.predict_array(a, (1.5, 1.5))
        sb = padded.predict_array(b, (1.5, 1.5))
        keys = [k for k in padded._cache if k[0] == 'bucket']
        assert len(keys) == 1, keys
        assert keys[0][1] == (96, 64)
        assert sa.shape == (70, 60, 5) and sb.shape == (90, 50, 5)
        ea = exact.predict_array(a, (1.5, 1.5))
        eb = exact.predict_array(b, (1.5, 1.5))
        # geometry matches exact mode; only fp-level borderline flips remain
        assert (sa == ea).mean() > 0.999, (sa != ea).mean()
        assert (sb == eb).mean() > 0.999, (sb != eb).mean()

    def test_matches_exact_under_resampling(self, groups, rng):
        """Input spacing != plan spacing: the per-scan resample matrices
        (scatter-built on device) must reproduce the exact path's
        mirror-tap B-spline semantics."""
        specs, params = groups
        exact = EnsembleEngine(specs, params)
        padded = EnsembleEngine(specs, params, pad_quantum=32)
        a = (rng.standard_normal((70, 60, 2)) + 2.0).astype(np.float32)
        ea = exact.predict_array(a, (1.0, 2.0))   # y up-, x down-sampled
        sa = padded.predict_array(a, (1.0, 2.0))
        assert sa.shape == ea.shape
        assert (sa == ea).mean() > 0.995, (sa != ea).mean()

    def test_different_sizes_cobatch(self, groups, rng):
        """Two different-size scans submitted together land in the SAME
        micro-batch bucket (exact mode would dispatch two programs)."""
        specs, params = groups
        eng = EnsembleEngine(specs, params, pad_quantum=32, auto_batch=4)
        try:
            eng._batcher.ramp_solos = 0
            eng._batcher.min_fill = 2
            a = (rng.standard_normal((70, 60, 2)) + 2.0).astype(np.float32)
            b = (rng.standard_normal((90, 50, 2)) + 2.0).astype(np.float32)
            with eng._batcher._cv:  # queue both before the dispatcher runs
                ha = eng.predict_array_async(a, (1.5, 1.5))
                hb = eng.predict_array_async(b, (1.5, 1.5))
            sa = eng.finish_array(ha)
            sb = eng.finish_array(hb)
            assert sa.shape == (70, 60, 5) and sb.shape == (90, 50, 5)
            st = eng._batcher.stats()
            assert st['batch_scans_coalesced'] == 2, st
        finally:
            eng.close()

    def test_masked_norm_plan_with_pad_quantum(self, groups, rng):
        import dataclasses
        specs, params = groups
        specs_m = [dataclasses.replace(
            s, preprocess=dataclasses.replace(
                s.preprocess, use_mask_for_norm=(True, True)))
            for s in specs]
        exact = EnsembleEngine(specs_m, params)
        padded = EnsembleEngine(specs_m, params, pad_quantum=32)
        a = np.zeros((80, 70, 2), np.float32)
        a[8:72, 6:64] = (rng.standard_normal((64, 58, 2)) + 3.0)
        ea = exact.predict_array(a, (1.5, 1.5))
        sa = padded.predict_array(a, (1.5, 1.5))
        assert sa.shape == ea.shape
        assert (sa == ea).mean() > 0.999, (sa != ea).mean()

    def test_ct_norm_border_stays_zero(self, groups, rng):
        """CTNormalization ignores the norm mask, so the padded border must
        be re-zeroed AFTER normalization (exact mode pads zeros after
        normalizing; an un-zeroed border would sit at -mean/std)."""
        import dataclasses
        specs, params = groups
        props = {'mean': 100.0, 'std': 50.0,
                 'percentile_00_5': -200.0, 'percentile_99_5': 400.0}
        specs_ct = [dataclasses.replace(
            s, preprocess=dataclasses.replace(
                s.preprocess,
                normalization_schemes=('CTNormalization',) * 2,
                intensity_properties=(props, props)))
            for s in specs]
        exact = EnsembleEngine(specs_ct, params)
        padded = EnsembleEngine(specs_ct, params, pad_quantum=32)
        a = (rng.standard_normal((70, 60, 2)) * 100 + 80).astype(np.float32)
        ea = exact.predict_array(a, (1.5, 1.5))
        sa = padded.predict_array(a, (1.5, 1.5))
        assert (sa == ea).mean() > 0.999, (sa != ea).mean()

    def test_bucket_sized_input_is_trivial(self, groups, rng):
        """A crop that exactly fills its bucket: identical canvases, so the
        bucket program must agree with exact mode everywhere but fp noise."""
        specs, params = groups
        exact = EnsembleEngine(specs, params)
        padded = EnsembleEngine(specs, params, pad_quantum=32)
        a = (rng.standard_normal((96, 64, 2)) + 2.0).astype(np.float32)
        ea = exact.predict_array(a, (1.5, 1.5))
        sa = padded.predict_array(a, (1.5, 1.5))
        assert (sa == ea).mean() > 0.999, (sa != ea).mean()

    def test_small_input_below_patch(self, groups, rng):
        """Buckets below the patch size still tile over a >= patch canvas
        with exact-mode symmetric placement."""
        specs, params = groups
        exact = EnsembleEngine(specs, params)
        padded = EnsembleEngine(specs, params, pad_quantum=32)
        a = (rng.standard_normal((40, 30, 2)) + 2.0).astype(np.float32)
        ea = exact.predict_array(a, (1.5, 1.5))
        sa = padded.predict_array(a, (1.5, 1.5))
        assert sa.shape == ea.shape
        assert (sa == ea).mean() > 0.999, (sa != ea).mean()

    def test_warmup_warms_the_bucket(self, groups):
        specs, params = groups
        eng = EnsembleEngine(specs, params, pad_quantum=32, auto_batch=2)
        try:
            eng.warmup((70, 60), (1.5, 1.5))
            keys = [k for k in eng._cache if k[0] == 'bucket']
            assert keys and keys[0][1] == (96, 64)
            bkeys = [k for k in eng._cache if k[0] == 'batch']
            assert bkeys and bkeys[0][2] == (96, 64)
        finally:
            eng.close()

    def test_invalid_quantum_rejected(self, groups):
        specs, params = groups
        with pytest.raises(ValueError, match='pad_quantum'):
            EnsembleEngine(specs, params, pad_quantum=0)


class TestCompactWire:
    """The compacted mask wire (ensemble_engine._compact_pack): sparse
    packed masks ship only their occupied tiles through the download wire;
    reconstruction must be BIT-IDENTICAL to the plain packed output on
    every serving path and every sparsity regime (empty / sparse / dense).
    """

    def test_roundtrip_all_sparsities(self, rng):
        import jax
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            _COMPACT_TILE, _compact_pack, occupied_count, pick_prefix,
            uncompact)
        for h, w, nb, density in [(37, 29, 3, 0.0), (37, 29, 3, 0.02),
                                  (64, 64, 15, 0.5), (11, 7, 1, 1.0),
                                  (50, 31, 5, 0.13)]:
            packed = (rng.random((h, w, nb)) < density).astype(np.uint8)
            packed *= rng.integers(1, 256, packed.shape).astype(np.uint8)
            buf, occ = jax.jit(_compact_pack)(packed)
            buf, occ = np.asarray(buf), np.asarray(occ)
            T = -(-h * w * nb // _COMPACT_TILE)
            assert buf.shape == (T + 1, _COMPACT_TILE)
            count = occupied_count(occ, T)
            k = pick_prefix(count, T)
            assert k >= count
            rebuilt = uncompact(buf[:k], occ, count, (h, w, nb))
            assert np.array_equal(rebuilt, packed), (h, w, nb, density)

    def test_prefix_buckets_cover_and_bound(self):
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            pick_prefix, prefix_buckets)
        for T in (1, 7, 8, 100, 45938):
            bs = prefix_buckets(T)
            assert bs[-1] == T + 1
            assert len(bs) <= 5
            for count in (0, 1, T // 3, T):
                assert pick_prefix(count, T) >= count

    @pytest.mark.slow
    def test_solo_and_quantized_identical(self, groups, rng):
        specs, params = groups
        arr = np.zeros((70, 60, 2), np.float32)
        arr[5:62, 4:55] = rng.normal(size=(57, 51, 2)).astype(np.float32)
        plain = EnsembleEngine(specs, params, compact_wire=False)
        comp = EnsembleEngine(specs, params, compact_wire=True)
        assert np.array_equal(plain.predict_array(arr, (1.5, 1.5)),
                              comp.predict_array(arr, (1.5, 1.5)))
        qplain = EnsembleEngine(specs, params, pad_quantum=32,
                                compact_wire=False)
        qcomp = EnsembleEngine(specs, params, pad_quantum=32,
                               compact_wire=True)
        assert np.array_equal(qplain.predict_array(arr, (1.5, 1.5)),
                              qcomp.predict_array(arr, (1.5, 1.5)))

    @pytest.mark.slow
    def test_batched_identical(self, groups, rng):
        specs, params = groups
        comp = EnsembleEngine(specs, params, auto_batch=3, compact_wire=True)
        plain = EnsembleEngine(specs, params, auto_batch=3,
                               compact_wire=False)
        arrs = []
        for _ in range(3):
            a = np.zeros((70, 60, 2), np.float32)
            a[5:62, 4:55] = rng.normal(size=(57, 51, 2)).astype(np.float32)
            arrs.append(a)
        try:
            outs = {}
            for name, eng in (('comp', comp), ('plain', plain)):
                eng.set_batch_linger(30_000.0)
                hs = [eng.predict_array_async(a, (1.5, 1.5)) for a in arrs]
                outs[name] = [eng.finish_array(h) for h in hs]
                occ = eng._batcher.stats()['batch_occupancy']
                assert sum(c for i, c in enumerate(occ) if i > 0) >= 1, occ
            for a, b in zip(outs['comp'], outs['plain']):
                assert np.array_equal(a, b)
        finally:
            comp.close()
            plain.close()

    def test_batched_fetch_edge_regimes(self, rng):
        # fetch_compact_batch reconstructs from ONE prefix slab sized by
        # the LARGEST per-scan count: all-empty batches (kmax from count
        # 0), mixed empty/dense rows, and single-row batches must all
        # rebuild bit-identically
        import jax
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            _compact_pack, fetch_compact_batch)
        h, w, nb = 37, 29, 3
        cmeta = {'T': -(-h * w * nb // 8), 'shape': (h, w, nb)}
        regimes = [
            [0.0, 0.0, 0.0],        # every scan empty
            [0.0, 1.0, 0.02],       # empty + dense + sparse in one batch
            [0.3],                  # single-row batch
        ]
        for densities in regimes:
            packed = np.stack([
                ((rng.random((h, w, nb)) < d)
                 * rng.integers(1, 256, (h, w, nb))).astype(np.uint8)
                for d in densities])
            pairs = jax.jit(jax.vmap(_compact_pack))(packed)
            rebuilt = fetch_compact_batch(pairs, cmeta)
            assert np.array_equal(rebuilt, packed), densities

    def test_speculative_hint_paths(self, rng):
        # repeated fetches of one program keep a per-path hint (solo:
        # 'hint_solo', batched: 'hint_batch'): the 2nd+
        # fetch speculatively pulls the last bucket concurrently with the
        # bitmap. Every speculation outcome — cover (hint >= count),
        # undershoot (density jumped: bucket prefix refetched), overshoot
        # (density
        # dropped: extra rows ignored) — must stay bit-identical, for
        # both the solo and the batched fetch.
        import jax
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            _compact_pack, fetch_compact, fetch_compact_batch)
        h, w, nb = 37, 29, 3
        T = -(-h * w * nb // 8)

        def mk(density):
            return ((rng.random((h, w, nb)) < density)
                    * rng.integers(1, 256, (h, w, nb))).astype(np.uint8)

        cmeta = {'T': T, 'shape': (h, w, nb)}
        pack = jax.jit(_compact_pack)
        # cold (no hint) -> sparse -> dense (undershoot) -> sparse
        # (overshoot) -> empty (overshoot to count 0)
        for density in (0.02, 0.02, 0.9, 0.02, 0.0):
            packed = mk(density)
            rebuilt = fetch_compact(pack(packed), cmeta)
            assert np.array_equal(rebuilt, packed), density
            assert cmeta['hint_solo'] >= 1

        cmeta_b = {'T': T, 'shape': (h, w, nb)}
        packb = jax.jit(jax.vmap(_compact_pack))
        for densities in ([0.02, 0.0], [0.9, 0.02], [0.0, 0.0]):
            packed = np.stack([mk(d) for d in densities])
            rebuilt = fetch_compact_batch(packb(packed), cmeta_b)
            assert np.array_equal(rebuilt, packed), densities
            assert cmeta_b['hint_batch'] >= 1

    def test_speculative_hint_solo_batch_isolation(self, rng):
        # mixed solo/batch traffic on ONE program shares the cached meta
        # dict: the paths must keep SEPARATE hint slots (batch-max counts
        # run above solo counts; a shared slot would ping-pong the
        # speculative prefix size) and stay bit-identical interleaved
        import jax
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            _compact_pack, fetch_compact, fetch_compact_batch)
        h, w, nb = 31, 27, 2
        cmeta = {'T': -(-h * w * nb // 8), 'shape': (h, w, nb)}
        pack = jax.jit(_compact_pack)
        packb = jax.jit(jax.vmap(_compact_pack))

        def mk(density):
            return ((rng.random((h, w, nb)) < density)
                    * rng.integers(1, 256, (h, w, nb))).astype(np.uint8)

        for solo_d, batch_ds in ((0.02, [0.6, 0.02]), (0.02, [0.9, 0.0]),
                                 (0.5, [0.02, 0.02])):
            solo = mk(solo_d)
            assert np.array_equal(fetch_compact(pack(solo), cmeta), solo)
            batch = np.stack([mk(d) for d in batch_ds])
            assert np.array_equal(
                fetch_compact_batch(packb(batch), cmeta), batch)
        assert cmeta['hint_solo'] >= 1 and cmeta['hint_batch'] >= 1

    def test_speculative_hint_concurrent_fetches(self, rng):
        # concurrent fetches of one program share the mutable hint: the
        # race is benign by design (any recent bucket works — undershoot
        # tops up, overshoot over-fetches), but every interleaving must
        # stay bit-identical
        import jax
        from concurrent.futures import ThreadPoolExecutor
        from totalsegmentator2d_tpu.inference.ensemble_engine import (
            _compact_pack, fetch_compact)
        h, w, nb = 23, 19, 2
        cmeta = {'T': -(-h * w * nb // 8), 'shape': (h, w, nb)}
        pack = jax.jit(_compact_pack)
        packs = []
        for density in (0.02, 0.6, 0.0, 0.9, 0.1, 0.02, 1.0, 0.3):
            packed = ((rng.random((h, w, nb)) < density)
                      * rng.integers(1, 256, (h, w, nb))).astype(np.uint8)
            packs.append((packed, pack(packed)))
        with ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(lambda p: fetch_compact(p[1], cmeta),
                                 packs))
        for (packed, _), rebuilt in zip(packs, outs):
            assert np.array_equal(rebuilt, packed)

    def test_env_gate(self, groups, monkeypatch):
        specs, params = groups
        monkeypatch.setenv('TS2D_COMPACT', '0')
        eng = EnsembleEngine(specs, params)
        assert eng.compact_wire is False
        monkeypatch.delenv('TS2D_COMPACT')
        assert EnsembleEngine(specs, params).compact_wire is True

    @pytest.mark.slow
    def test_volume_and_cohort_paths_identical(self, groups, rng):
        comp_specs, comp_params = groups
        vol = np.zeros((40, 30, 36), np.float32)
        vol[4:36, 3:27, 5:30] = rng.normal(
            40.0, 200.0, (32, 24, 25)).astype(np.float32)
        comp = EnsembleEngine(comp_specs, comp_params, compact_wire=True)
        plain = EnsembleEngine(comp_specs, comp_params, compact_wire=False)
        sc, pc = comp.predict_volume(vol, (1.5, 1.5), ('max', 'mean'))
        sp, pp = plain.predict_volume(vol, (1.5, 1.5), ('max', 'mean'))
        assert np.array_equal(sc, sp) and np.array_equal(pc, pp)
        vols = np.stack([vol, np.roll(vol, 3, axis=0)])
        assert np.array_equal(
            comp.predict_cohort(vols, (1.5, 1.5), ('max', 'mean')),
            plain.predict_cohort(vols, (1.5, 1.5), ('max', 'mean')))
        mixed = [vol, vol[:36, :28, :30]]
        a = comp.predict_cohort_mixed(mixed, (1.5, 1.5), ('max', 'mean'),
                                      bucket='pad')
        b = plain.predict_cohort_mixed(mixed, (1.5, 1.5), ('max', 'mean'),
                                       bucket='pad')
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


class TestOnePassServingDefault:
    pytestmark = pytest.mark.slow
    """The batched and quantized-bucket serving programs default to
    one-pass InstanceNorm statistics (unet.stats_override('1pass')): a
    measured ~7% device win (tools/perf_probe20.py) whose ~1e-6 logit
    drift flips only borderline pixels — the same non-bitwise class those
    paths already are vs the solo exact program. The solo program stays
    two-pass: it is the bitwise torch-parity path (tools/parity.py)."""

    @staticmethod
    def _spy(monkeypatch):
        """Record every trace-time statistics-form resolution."""
        import totalsegmentator2d_tpu.models.unet as unet
        calls = []
        orig = unet._one_pass_stats

        def spy():
            v = orig()
            calls.append(v)
            return v

        monkeypatch.setattr(unet, '_one_pass_stats', spy)
        return calls

    def test_solo_two_pass_batched_one_pass(self, groups, rng, monkeypatch):
        monkeypatch.delenv('TS2D_STATS', raising=False)
        specs, params = groups
        calls = self._spy(monkeypatch)
        eng = EnsembleEngine(specs, params)
        arr = (rng.standard_normal((64, 64, 2)) + 2).astype(np.float32)
        eng.predict_array(arr, (1.5, 1.5))
        assert calls and not any(calls)  # solo exact program: two-pass
        calls.clear()
        fn, _ = eng._batched_program(2, (64, 64), (1.5, 1.5), False, None)
        fn(eng.params, np.stack([arr, arr]))  # traces here, on this thread
        assert calls and all(calls)  # batched program: one-pass

    def test_bucket_one_pass(self, groups, rng, monkeypatch):
        monkeypatch.delenv('TS2D_STATS', raising=False)
        specs, params = groups
        calls = self._spy(monkeypatch)
        eng = EnsembleEngine(specs, params, pad_quantum=32)
        arr = (rng.standard_normal((70, 60, 2)) + 2).astype(np.float32)
        eng.predict_array(arr, (1.5, 1.5))
        assert calls and all(calls)  # bucket program: one-pass

    def test_env_overrides_both_ways(self, groups, rng, monkeypatch):
        specs, params = groups
        arr = (rng.standard_normal((70, 60, 2)) + 2).astype(np.float32)
        monkeypatch.setenv('TS2D_STATS', '2pass')
        calls = self._spy(monkeypatch)
        eng = EnsembleEngine(specs, params, pad_quantum=32)
        eng.predict_array(arr, (1.5, 1.5))
        assert calls and not any(calls)  # env forces 2pass on the bucket
        calls.clear()
        monkeypatch.setenv('TS2D_STATS', '1pass')
        eng2 = EnsembleEngine(specs, params)
        eng2.predict_array(arr, (1.5, 1.5))
        assert calls and all(calls)  # env forces 1pass on the solo path

    def test_batched_default_agreement(self, groups, rng, monkeypatch):
        """Numerical pin of the flip class: batched (one-pass) vs solo
        (two-pass) masks agree on > 99.9% of voxels — the same contract
        tools/parity.py enforces on the batched entry — and forcing 2pass
        restores bitwise equality (so the residual IS the stats form)."""
        monkeypatch.delenv('TS2D_STATS', raising=False)
        specs, params = groups
        plain = EnsembleEngine(specs, params)
        batched = EnsembleEngine(specs, params, auto_batch=4)
        try:
            arrs = [(rng.standard_normal((80, 70, 2)) + 2).astype(np.float32)
                    for _ in range(4)]
            handles = [batched.predict_array_async(a, (1.5, 1.5))
                       for a in arrs]
            for a, h in zip(arrs, handles):
                ref = plain.predict_array(a, (1.5, 1.5))
                out = batched.finish_array(h)
                assert (out == ref).mean() > 0.999, (out != ref).mean()
        finally:
            batched.close()
        monkeypatch.setenv('TS2D_STATS', '2pass')
        b2 = EnsembleEngine(specs, params, auto_batch=4)
        try:
            handles = [b2.predict_array_async(a, (1.5, 1.5)) for a in arrs]
            for a, h in zip(arrs, handles):
                np.testing.assert_array_equal(
                    b2.finish_array(h), plain.predict_array(a, (1.5, 1.5)))
        finally:
            b2.close()

    def test_invalid_values_rejected(self, monkeypatch):
        from totalsegmentator2d_tpu.models.unet import (_one_pass_stats,
                                                        stats_override)
        monkeypatch.setenv('TS2D_STATS', 'onepass')
        with pytest.raises(ValueError, match='TS2D_STATS'):
            _one_pass_stats()
        with pytest.raises(ValueError, match='stats_override'):
            with stats_override('fast'):
                pass

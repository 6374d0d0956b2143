"""Multi-chip program STRUCTURE evidence (VERDICT r3 item 7).

The dryrun (:mod:`__graft_entry__`) proves the sharded programs compile,
execute, and agree with the single-device output. These tests pin the
*shape* of the parallelism itself on the virtual 8-device CPU mesh, so a
regression that silently de-shards a program (e.g. GSPMD replicating the
batch instead of splitting it) fails loudly rather than just running
slower on a real pod:

* cohort data parallelism — each device holds exactly batch/D scans,
  parameters are fully replicated, and the output stays batch-sharded
  (no gratuitous gather back to one device);
* tile-sharded single-scan mode — the compiled HLO contains the
  cross-device ``all-reduce`` that merges the partial Gaussian
  accumulators (the shard_map ``psum`` riding ICI on hardware), and every
  device computes only its slice of the tile grid.

The intended production launch topologies are documented in
docs/architecture.md ("Launching on a TPU pod").
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from totalsegmentator2d_tpu.parallel import make_mesh

N_DEV = 8


@pytest.fixture(scope='module')
def engines():
    from tests.model_fixtures import make_dataset_json, make_plans
    from totalsegmentator2d_tpu.inference import EnsembleEngine
    from totalsegmentator2d_tpu.models.plans import parse_model_spec
    from totalsegmentator2d_tpu.models.unet import init_params_np

    if len(jax.devices()) < N_DEV:
        pytest.skip(f'needs {N_DEV} devices')
    specs, params = [], []
    for i, labels in enumerate((('heart', 'aorta', 'vein'),
                                ('r1', 'r2', 'r3', 'r4'))):
        spec = parse_model_spec(make_plans(patch=(32, 32)),
                                make_dataset_json(labels))
        specs.append(spec)
        params.append([init_params_np(i, spec.arch)])
    mesh = make_mesh({'data': N_DEV}, devices=jax.devices()[:N_DEV])
    plain = EnsembleEngine(specs, params)
    tiled = EnsembleEngine(specs, params, tile_mesh=mesh, tile_axis='data')
    return plain, tiled, mesh


class TestCohortDataParallel:
    VOL = (20, 12, 16)  # (Z, Y, X)

    def _compiled(self, engines):
        plain, _, mesh = engines
        fn, _ = plain._build_cohort(N_DEV, self.VOL, (1.5, 1.5),
                                    ('max', 'mean'), mesh)
        vols = jax.ShapeDtypeStruct((N_DEV,) + self.VOL, jnp.float32)
        return plain, fn.lower(plain.params, vols).compile()

    def test_input_shards_one_scan_per_device(self, engines):
        plain, compiled = self._compiled(engines)
        params_sh, vols_sh = compiled.input_shardings[0]
        global_shape = (N_DEV,) + self.VOL
        assert vols_sh.shard_shape(global_shape) == (1,) + self.VOL
        # every device holds a DISTINCT batch row (true split, not a
        # replicated batch): 8 single-row shards
        dev_rows = {
            d.id: idx[0] for d, idx in
            vols_sh.devices_indices_map(global_shape).items()}
        starts = sorted((s.start or 0) for s in dev_rows.values())
        assert starts == list(range(N_DEV)), starts

    def test_params_fully_replicated(self, engines):
        plain, compiled = self._compiled(engines)
        params_sh, _ = compiled.input_shardings[0]
        leaves = jax.tree_util.tree_leaves(params_sh)
        assert leaves, 'no param shardings captured'
        assert all(s.is_fully_replicated for s in leaves)

    def test_output_stays_batch_sharded(self, engines):
        plain, compiled = self._compiled(engines)
        out_sh = jax.tree_util.tree_leaves(compiled.output_shardings)
        assert len(out_sh) == 1
        # merged multilabel seg (N, Z, X, 3+4 labels)
        out_shape = (N_DEV, self.VOL[0], self.VOL[2], 7)
        assert out_sh[0].shard_shape(out_shape) == \
            (1, self.VOL[0], self.VOL[2], 7)


class TestTileSharded:
    SHAPE = (70, 60)  # 12 tiles at patch 32 / step 0.5 -> 2 tiles/device

    def _compiled(self, engines):
        _, tiled, _ = engines
        fn, meta = tiled._program(self.SHAPE, (1.5, 1.5))
        x = jax.ShapeDtypeStruct(self.SHAPE + (2,), jnp.float32)
        return meta, fn.lower(tiled.params, x).compile()

    def test_hlo_contains_accumulator_all_reduce(self, engines):
        """The partial Gaussian accumulators of the sliding window merge
        with a cross-device psum — visible as all-reduce over all 8
        devices in the optimized HLO (rides ICI on hardware)."""
        _, compiled = self._compiled(engines)
        hlo = compiled.as_text()
        ars = re.findall(r'all-reduce[^\n]*replica_groups=[^\n]*', hlo)
        assert ars, 'no all-reduce in the tile-sharded program HLO'
        # the merge spans ALL devices (one group of 8), not a sub-group
        assert any(
            re.search(r'replica_groups=\{\{0(,\d+){%d}\}\}' % (N_DEV - 1),
                      a) or f'[1,{N_DEV}]<=[{N_DEV}]' in a
            for a in ars), ars[:3]

    def test_tile_grid_splits_across_devices(self, engines):
        """The program partitions the tile grid: per-device HLO works on
        T/D tiles (the shard_map in_spec P(ax)), so the dominant conv
        batch is tiles/device x TTA, not the full grid."""
        meta, compiled = self._compiled(engines)
        n_tiles = meta['n_tiles']
        assert n_tiles >= N_DEV, 'grid too small to shard'
        hlo = compiled.as_text()
        # SPMD-partitioned module: tiles enter as (Tpad/D, 2) per device
        per_dev = -(-n_tiles // N_DEV)
        assert re.search(r's32\[%d,2\]' % per_dev, hlo), \
            f'no per-device ({per_dev},2) tile shard in HLO'

    def test_matches_unsharded_result(self, engines):
        plain, tiled, _ = engines
        rng = np.random.default_rng(7)
        arr = (rng.standard_normal(self.SHAPE + (2,)) + 2).astype(np.float32)
        a = plain.predict_array(arr, (1.5, 1.5))
        b = tiled.predict_array(arr, (1.5, 1.5))
        assert a.shape == b.shape
        assert (np.asarray(a) == np.asarray(b)).mean() > 0.9999


class TestTrainingSharded:
    """The TRAINING step's parallel structure on a dp×tp mesh (the
    inference classes above pin cohort-dp and tile-sharded): the batch
    genuinely splits on 'data', conv weights genuinely split their
    output-channel axis on 'model' (training/train.py
    build_sharded_train_step; parallel/sharding.py rules), the gradient
    reduction shows up as cross-device all-reduce in the optimized HLO,
    and the loss comes back replicated."""

    B = 8

    @pytest.fixture(scope='class')
    def compiled_step(self):
        from __graft_entry__ import _flagship_spec
        from totalsegmentator2d_tpu.models.unet import init_params
        from totalsegmentator2d_tpu.training import TrainConfig
        from totalsegmentator2d_tpu.training.train import \
            build_sharded_train_step

        if len(jax.devices()) < N_DEV:
            pytest.skip(f'needs {N_DEV} devices')
        spec = _flagship_spec(out_channels=4, in_channels=2, n_stages=3)
        cfg = TrainConfig(lr=1e-2, total_steps=10, multilabel=True,
                          deep_supervision=False)
        mesh = make_mesh({'data': 4, 'model': 2},
                         devices=jax.devices()[:N_DEV])
        params = init_params(jax.random.PRNGKey(0), spec)
        step, params, opt_state, _ = build_sharded_train_step(
            mesh, spec, cfg, params)
        batch = {
            'image': jax.ShapeDtypeStruct((self.B, 32, 32, 2), jnp.float32),
            'target': jax.ShapeDtypeStruct((self.B, 32, 32, 4), jnp.float32),
        }
        return params, step.lower(params, opt_state, batch).compile()

    def test_batch_shards_on_data_axis(self, compiled_step):
        _, compiled = compiled_step
        _, _, batch_sh = compiled.input_shardings[0]
        shape = (self.B, 32, 32, 2)
        assert batch_sh['image'].shard_shape(shape) == \
            (self.B // 4, 32, 32, 2)
        # distinct batch rows per data-shard (a true split, not replicas)
        starts = {(idx[0].start or 0) for idx in
                  batch_sh['image'].devices_indices_map(shape).values()}
        assert starts == {0, 2, 4, 6}, starts

    def test_conv_weights_shard_output_channels(self, compiled_step):
        params, _ = compiled_step
        # stage-0 block-1 conv: (3, 3, 32, 32) HWIO
        w = params['encoder']['stages'][0][1]['conv']['w']
        assert w.sharding.shard_shape(w.shape) == \
            w.shape[:-1] + (w.shape[-1] // 2,)
        # and not everything replicates: tp is in effect across the tree
        leaves = jax.tree_util.tree_leaves(params)
        assert sum(not leaf.sharding.is_fully_replicated
                   for leaf in leaves) >= 10

    def test_hlo_has_gradient_all_reduce(self, compiled_step):
        _, compiled = compiled_step
        hlo = compiled.as_text()
        assert re.search(r'all-reduce', hlo), \
            'no cross-device reduction in the training-step HLO'

    def test_loss_replicated(self, compiled_step):
        _, compiled = compiled_step
        _, _, loss_sh = compiled.output_shardings
        assert loss_sh.is_fully_replicated


class TestAugmentSharded:
    @pytest.mark.slow  # heavy 8-device compile; the per-round dryrun
    # (__graft_entry__.dryrun_multichip) exercises the same path
    def test_partitioned_augment_runs_on_dp_sharded_batch(self, rng=None):
        """The batch-partitioned spatial stage (permutation gather +
        static-count warp, training/augment.spatial_transform_batch) must
        compile and execute under GSPMD with the batch sharded on a data
        axis — the Trainer's multichip augment path. The permutation
        crosses shard boundaries, so GSPMD inserts collectives; this
        pins that it stays a working program, with the output still
        device-distributed."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from totalsegmentator2d_tpu.training.augment import augment_batch

        if len(jax.devices()) < N_DEV:
            pytest.skip(f'needs {N_DEV} devices')
        mesh = make_mesh({'data': N_DEV}, devices=jax.devices()[:N_DEV])
        sh = NamedSharding(mesh, P('data'))
        r = np.random.default_rng(0)
        image = r.standard_normal((16, 48, 44, 2)).astype(np.float32)
        target = (r.random((16, 48, 44, 3)) > 0.8).astype(np.uint8)
        batch = {'image': jax.device_put(image, sh),
                 'target': jax.device_put(target, sh)}
        # out_shardings pinned to the input's, as Trainer.step does — the
        # permutation otherwise makes GSPMD replicate the output
        out = jax.jit(lambda k, b: augment_batch(k, b),
                      out_shardings={'image': sh, 'target': sh})(
            jax.random.PRNGKey(0), batch)
        img = np.asarray(out['image'])
        assert img.shape == image.shape
        assert np.isfinite(img).all()
        assert set(np.unique(np.asarray(out['target']))) <= {0, 1}
        assert not out['image'].sharding.is_fully_replicated

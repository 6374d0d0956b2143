"""Foundation utilities: dot-key params, colors, config loaders, temp dirs."""

import os
from typing import List

from totalsegmentator2d_tpu.utils import colors, config, params, temp


class TestParams:
    def test_dict_get_nested(self):
        d = {'a': {'b': {'c': 5}}}
        assert params.dict_get(d, 'a.b.c') == 5
        assert params.dict_get(d, 'a.b.x', default=7) == 7

    def test_dict_get_flat(self):
        d = {'nnu.predict.stepsize': 0.5}
        assert params.dict_get(d, 'nnu.predict.stepsize') == 0.5

    def test_dict_get_mixed(self):
        d = {'nnu': {'predict.stepsize': 0.5}}
        assert params.dict_get(d, 'nnu.predict.stepsize') == 0.5

    def test_dtype_conversion(self):
        d = {'folds': '3', 'list': [1, '2']}
        assert params.dict_get(d, 'folds', dtype=int) == 3
        assert params.dict_get(d, 'list', dtype=List[int]) == [1, 2]
        assert params.dict_get({'v': 'false'}, 'v', dtype=bool) is False
        assert params.dict_get({'v': 'true'}, 'v', dtype=bool) is True

    def test_nest_flatten_roundtrip(self):
        flat = {'a.b': 1, 'a.c': 2, 'd': 3}
        nested = params.nest_dict(flat)
        assert nested == {'a': {'b': 1, 'c': 2}, 'd': 3}
        assert params.flatten_dict(nested) == flat

    def test_merge_deep(self):
        a = {'x': {'y': 1, 'z': 2}, 'k': 1}
        b = {'x': {'z': 3}, 'n': 4}
        merged = params.dict_merge(a, b)
        assert merged == {'x': {'y': 1, 'z': 3}, 'k': 1, 'n': 4}
        assert a == {'x': {'y': 1, 'z': 2}, 'k': 1}  # inputs untouched

    def test_collections(self):
        assert params.as_list('a') == ['a']
        assert params.as_list(None) == []
        assert params.unwrap_singular(['x']) == 'x'

    def test_unwrap_singular_strict(self):
        """Reference types.py:160-177: >1 element raises by default."""
        import pytest
        with pytest.raises(ValueError):
            params.unwrap_singular([1, 2])
        assert params.unwrap_singular([1, 2], fail=False) == [1, 2]
        assert params.unwrap_singular({'k': 'v'}) == 'v'
        assert params.unwrap_singular(5) == 5
        assert params.unwrap_singular('ab') == 'ab'  # strings pass through

    def test_nest_sequences(self):
        """Reference types.py:110-127,203-227: [i] segments become lists."""
        flat = {'a.b[1]': 'y', 'a.b[0]': 'x', 'a.b[2].c': 3}
        nested = params.nest_dict(flat)
        assert nested == {'a': {'b': ['x', 'y', {'c': 3}]}}
        assert params.dict_get(flat, 'a.b') == ['x', 'y', {'c': 3}]
        import pytest
        with pytest.raises(ValueError):
            params.nest_dict({'a.[0]': 1})  # empty sequence name
        with pytest.raises(ValueError):
            params.nest_dict({'a.b[x]': 1})  # non-integer index
        with pytest.raises(ValueError):
            params.nest_dict({'a[0]': 1, 'a.b': 2})  # seq vs dict clash
        with pytest.raises(ValueError):
            params.nest_dict({'a[0]': 1, 'a[2]': 2}, check_sequence=True)

    def test_leaf_markers(self):
        """Reference types.py:60-107: a node may hold both a leaf ('~')
        and a subgroup; plain access returns the leaf, 'a.~' addresses it
        explicitly, a trailing dot addresses the subgroup."""
        flat = {'a': 1, 'a.b': 2}
        nested = params.nest_dict(flat)
        assert nested == {'a': {'~': 1, 'b': 2}}
        assert params.dict_get(flat, 'a') == 1      # literal key wins
        assert params.dict_get(nested, 'a') == 1    # leaf preferred
        assert params.dict_get(nested, 'a.~') == 1
        assert params.dict_get(nested, 'a.b') == 2
        assert params.dict_get(nested, 'a.') == {'~': 1, 'b': 2}
        # leaf arriving after the subgroup attaches to the node ('~'),
        # per the reference docstring (its code drops it on the parent)
        assert params.nest_dict({'a.b': 2, 'a': 1}) == {'a': {'~': 1, 'b': 2}}
        # '~' on a plain value is the value itself
        assert params.dict_get({'a': {'b': 5}}, 'a.b.~') == 5

    def test_nest_normalizes_keys(self):
        assert params.nest_dict({' A .B': 1}) == {'a': {'b': 1}}
        import pytest
        with pytest.raises(ValueError):
            params.nest_dict({'a..b': 1})

    def test_required_and_dict_dtype(self):
        import pytest
        from typing import Dict
        with pytest.raises(RuntimeError):
            params.dict_get({}, 'missing.key', required=True)
        d = {'m': {'1': '2', '3': '4'}}
        assert params.dict_get(d, 'm', dtype=Dict[int, int]) == {1: 2, 3: 4}


class TestColors:
    def test_hex_roundtrip(self):
        assert colors.hex_to_rgb('#9370DB') == (0x93, 0x70, 0xDB)
        assert colors.rgb_to_hex((147, 112, 219)) == '#9370db'

    def test_default_palette_deterministic(self):
        p1 = colors.default_palette(20)
        p2 = colors.default_palette(20)
        assert p1 == p2
        assert p1[0] == (255, 0, 0)
        assert len(p1) == 20

    def test_color_str_floats(self):
        s = colors.to_color_str_rgb_floats((255, 0, 128), sep=' ')
        rgb = colors.color_str_to_rgb(s)
        assert rgb[0] == 255 and rgb[1] == 0 and abs(rgb[2] - 128) <= 1

    def test_to_palette_dense(self):
        pal = colors.to_palette({1: '#ff0000', 3: (0, 0, 255)})
        assert pal[0] == [255, 255, 255]   # background
        assert pal[1] == [255, 0, 0]
        assert pal[3] == [0, 0, 255]
        assert len(pal) == 4


class TestConfig:
    def test_label_colors_loaded(self):
        lc = config.get_label_colors()
        assert len(lc) > 100
        assert lc['esophagus'].startswith('#')
        assert all(k == k.lower() for k in lc)

    def test_default_model(self):
        assert config.get_default_model() == 'ts2d-v2-ep4000b2'

    def test_resolve_map(self):
        m = config.get_model_resolve_map()
        assert m['ts2d'] == 'ts2d-v2'
        assert m['ts2d-v2'] == 'ts2d-v2-ep4000b2'

    def test_shared_urls(self):
        urls = config.get_shared_urls(fetch_remote=False)
        assert 'ts2d-v2-ep4000b2' in urls
        assert 'cardiac' in urls['ts2d-v2-ep4000b2']['r001']


class TestTemp:
    def test_safe_tempdir_cleanup(self):
        with temp.SafeTemporaryDirectory() as path:
            assert os.path.isdir(path)
            assert os.path.exists(os.path.join(path, '~INFO.json'))
        assert not os.path.exists(path)

    def test_orphan_reaped(self, tmp_path, monkeypatch):
        monkeypatch.setenv('TS2D_TEMP', str(tmp_path))
        # fabricate an orphan owned by an impossible pid
        orphan = tmp_path / 'orphan'
        orphan.mkdir()
        (orphan / '~INFO.json').write_text('{"pid": 999999999, "create_time": 0}')
        removed = temp.reap_orphans(str(tmp_path))
        assert removed == 1
        assert not orphan.exists()

    def test_temporary_destination_atomic(self, tmp_path, monkeypatch):
        monkeypatch.setenv('TS2D_TEMP', str(tmp_path / 'scratch'))
        dest = tmp_path / 'out' / 'result.txt'
        with temp.TemporaryDestination(str(dest)) as wp:
            with open(wp, 'w') as f:
                f.write('done')
            assert not dest.exists()
        assert dest.read_text() == 'done'


class TestMiscParity:
    def test_format_array(self):
        from totalsegmentator2d_tpu.utils.params import format_array
        assert format_array([1.5, 2.0, 3.25], p=2) == '1.5, 2, 3.25'
        assert format_array([1, 2]) == '1, 2'

    def test_short_message(self):
        from totalsegmentator2d_tpu.utils.params import short_message
        assert short_message('abc', 10) == 'abc'
        out = short_message('x' * 200, 20)
        assert len(out) == 20 and out.endswith('...')

    def test_unit_vector(self):
        import numpy as np
        from totalsegmentator2d_tpu.utils.params import unit_vector
        np.testing.assert_allclose(unit_vector([3, 4]), [0.6, 0.8])

    def test_meta_helpers(self):
        import numpy as np
        from totalsegmentator2d_tpu.io.image import MedicalImage
        from totalsegmentator2d_tpu.ops.annotations import (
            get_image_meta, sanitize_meta, set_image_meta)
        img = MedicalImage(array=np.zeros((2, 3), np.uint8))
        set_image_meta(img, {'a': 1, 'long': 'x' * 100}, limit=10)
        assert img.meta['a'] == '1'
        assert len(img.meta['long']) == 10
        meta = get_image_meta(img, add_info=True)
        assert meta['size'] == (3, 2)
        assert sanitize_meta({'6000|3000': 'big', 'k': 'v'}) == {'k': 'v'}


class TestParamsReviewRegressions:
    def test_sequence_leaf_joins_subgroup_both_orders(self):
        """a[0].b then a[0] (and vice versa) must merge into a '~' node,
        not destroy the subgroup."""
        from totalsegmentator2d_tpu.utils.params import nest_dict
        assert nest_dict({'a[0].b': 2, 'a[0]': 1}) == {'a': [{'b': 2, '~': 1}]}
        assert nest_dict({'a[0]': 1, 'a[0].b': 2}) == {'a': [{'~': 1, 'b': 2}]}

    def test_dict_get_indexes_nested_sequences(self):
        """dict_get(nest_dict(d), k) must equal dict_get(d, k) for
        bracketed keys (lists are indexed, not just flat-key matched)."""
        from totalsegmentator2d_tpu.utils.params import dict_get, nest_dict
        flat = {'a.b[0]': 'x', 'a.b[1]': 'y', 'a.b[2].c': 3}
        nested = nest_dict(flat)
        for k in ('a.b[0]', 'a.b[1]', 'a.b[2].c'):
            assert dict_get(nested, k) == dict_get(flat, k)
        assert dict_get(nested, 'a.b[9]', default='d') == 'd'

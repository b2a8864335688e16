"""Host input pipeline upgrades (VERDICT r2 #4): decoded-image RAM cache
(PIL leaves the hot loop after epoch 1) and the process-pool decode option.
"""
import numpy as np
import pytest

from pointtinybenchmark_tpu.data.loader import DataLoader, DetCollator
from pointtinybenchmark_tpu.data.transforms import LoadImageFromFile


def _write_pngs(tmp_path, n=4, hw=(32, 40)):
    from PIL import Image
    rng = np.random.RandomState(0)
    files = []
    for i in range(n):
        arr = (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(arr).save(p)
        files.append((str(p), arr))
    return files


def test_decode_cache_hits_and_is_isolated(tmp_path, monkeypatch):
    files = _write_pngs(tmp_path)
    LoadImageFromFile._CACHE.clear()
    LoadImageFromFile._CACHE_BYTES[0] = 0
    loader = LoadImageFromFile(to_float32=True, cache=True)

    import pointtinybenchmark_tpu.data.transforms as T
    calls = {"n": 0}
    real_open = T.Image.open

    def counting_open(*a, **k):
        calls["n"] += 1
        return real_open(*a, **k)

    monkeypatch.setattr(T.Image, "open", counting_open)

    def load(path):
        return loader(dict(img_info=dict(file_name=path), img_prefix=None))

    first = [load(p)["img"] for p, _ in files]
    assert calls["n"] == len(files)
    second = [load(p)["img"] for p, _ in files]
    assert calls["n"] == len(files)          # cache hits: no new decodes
    for a, b, (_, raw) in zip(first, second, files):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, raw.astype(np.float32))
    # float32 output is a fresh buffer — mutating it must not poison cache
    second[0][:] = -1.0
    third = load(files[0][0])["img"]
    np.testing.assert_array_equal(third, files[0][1].astype(np.float32))


def test_decode_cache_respects_corner_and_budget(tmp_path):
    files = _write_pngs(tmp_path, n=2)
    LoadImageFromFile._CACHE.clear()
    LoadImageFromFile._CACHE_BYTES[0] = 0
    loader = LoadImageFromFile(cache=True)
    # two different corners of the same file are distinct cache entries
    a = loader(dict(img_info=dict(file_name=files[0][0],
                                  corner=(0, 0, 16, 16)), img_prefix=None))
    b = loader(dict(img_info=dict(file_name=files[0][0],
                                  corner=(16, 16, 32, 32)), img_prefix=None))
    assert a["img"].shape[:2] == (16, 16)
    assert not np.array_equal(a["img"], b["img"])
    assert len(LoadImageFromFile._CACHE) == 2

    # zero budget: decode still works, nothing cached
    LoadImageFromFile._CACHE.clear()
    LoadImageFromFile._CACHE_BYTES[0] = 0
    tiny = LoadImageFromFile(cache=True, cache_max_bytes=0)
    out = tiny(dict(img_info=dict(file_name=files[1][0]), img_prefix=None))
    assert out["img"].shape == (32, 40, 3)
    assert len(LoadImageFromFile._CACHE) == 0


class _ArrayDataset:
    """Minimal map-style dataset producing collator-ready samples."""

    def __init__(self, n=8):
        rng = np.random.RandomState(1)
        self.samples = [dict(
            img=rng.rand(16, 16, 3).astype(np.float32),
            img_metas=dict(scale_factor=[1, 1, 1, 1]),
            gt_bboxes=np.array([[1.0, 1.0, 5.0, 5.0]], np.float32),
            gt_labels=np.array([0])) for _ in range(n)]
        self.flag = np.zeros(n, np.int64)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


@pytest.mark.parametrize("use_processes", [False, True])
def test_loader_process_pool_matches_threads(use_processes):
    ds = _ArrayDataset()
    col = DetCollator(pad_shape=(16, 16), max_gt=4)
    dl = DataLoader(ds, batch_size=4, collator=col, shuffle=False,
                    drop_last=True, num_workers=2,
                    use_processes=use_processes)
    batches = list(iter(dl))
    dl.close()
    assert len(batches) == 2
    want = np.stack([s["img"] for s in ds.samples[:4]])
    np.testing.assert_allclose(batches[0]["img"], want)
    assert batches[0]["gt_valid"].sum() == 4

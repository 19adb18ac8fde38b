

def test_compress_batch_matches_sequential():
    import numpy as np
    from grokimagecompression_tpu import codec

    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 256, (96, 80), dtype=np.int32).astype(np.uint8)
            for _ in range(6)]
    seq = [codec.compress(a, ht=True) for a in imgs]
    bat = codec.compress_batch(imgs, ht=True)
    assert seq == bat
    outs = codec.decompress_batch(bat)
    for o, i in zip(outs, imgs):
        assert np.array_equal(o, i.astype(np.int32))
    assert codec.compress_batch([]) == []
    assert codec.decompress_batch([]) == []

import threading

from kmer_id_tpu.parallel.distributed import SampleQueue, health_check


def test_health_check():
    h = health_check()
    assert h["ok"]
    # every local device individually probed (8 virtual CPU devices)
    assert len(h["devices"]) == 8 and all(h["devices"].values())
    assert h["barrier_s"] is None  # single-process: no cross-process barrier


def test_sample_queue_claims_and_restart(tmp_path):
    mpath = str(tmp_path / "queue.json")
    q = SampleQueue(mpath, ["s1", "s2", "s3"])
    a = q.claim("w1")
    b = q.claim("w2")
    assert {a, b} == {"s1", "s2"}
    q.complete(a)
    # restart: a new queue over the same manifest keeps state
    q2 = SampleQueue(mpath, ["s1", "s2", "s3"])
    c = q2.claim("w3")
    assert c == "s3"
    q2.complete(c)
    assert q2.claim("w3") is None  # s2 still claimed, nothing pending
    stale = q2.reclaim_stale(timeout_s=0.0)
    assert stale == [b]
    assert q2.claim("w3") == b


def test_sample_queue_concurrent():
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        mpath = os.path.join(d, "q.json")
        samples = [f"s{i}" for i in range(40)]
        q = SampleQueue(mpath, samples)
        got = []
        lock = threading.Lock()

        def worker(w):
            while True:
                s = q.claim(w)
                if s is None:
                    return
                with lock:
                    got.append(s)
                q.complete(s)

        ts = [threading.Thread(target=worker, args=(f"w{i}",)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert sorted(got) == sorted(samples)

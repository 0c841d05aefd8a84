"""Id/path math parity (operators C3/C4, source S10) — golden values from
the reference's tests (/root/reference/tests/test_utils.py:30-110)."""

from htrc_feature_reader_spark.sources import ids


def test_id_encode_decode_roundtrip():
    raw = "ark:/13960/t1xd0sc6x"
    enc = ids.id_encode(raw)
    assert ":" not in enc and "/" not in enc and "." not in enc
    assert ids.id_decode(enc) == raw


def test_clean_htid_golden():
    # reference utils.py:56-63 semantics: lib part untouched, vol sanitized
    assert ids.clean_htid("uc2.ark:/13960/t1xd0sc6x") == "uc2.ark+=13960=t1xd0sc6x"
    assert ids.clean_htid("mdp.39015012345678") == "mdp.39015012345678"


def test_extract_htid_inverse():
    for name in (
        "uc2.ark+=13960=t1xd0sc6x.json.bz2",
        "uc2.ark+=13960=t1xd0sc6x.tokens.parquet",
        "uc2.ark+=13960=t1xd0sc6x.meta.json",
    ):
        assert ids.extract_htid(name) == "uc2.ark:/13960/t1xd0sc6x"


def test_pairtree_path():
    p = ids.pairtree_path("uc2.ark:/13960/t1xd0sc6x")
    parts = p.split("/")
    assert parts[0] == "uc2" and parts[1] == "pairtree_root"
    # every-2-char split of the sanitized volume id
    assert parts[2] == "ar" and parts[3] == "k+"
    assert parts[-1] == "ark+=13960=t1xd0sc6x"


def test_stubbytree_path_and_filename():
    # stubbytree: libid dir + every-3rd-char of the clean volume id
    p = ids.stubbytree_path("uc2.ark:/13960/t1xd0sc6x")
    lib, stub = p.split("/")
    assert lib == "uc2"
    assert stub == "ark+=13960=t1xd0sc6x"[::3]
    fn = ids.stubbytree_filename("uc2.ark:/13960/t1xd0sc6x", "json", "bz2")
    assert fn.endswith("uc2.ark+=13960=t1xd0sc6x.json.bz2")
    assert fn.startswith(p)

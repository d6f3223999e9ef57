import asyncio

from sqe_tpu.serving.auth import UserFileAuth, allow_all_auth


def test_allow_all_rejects_empty():
    assert asyncio.run(allow_all_auth("alice"))
    assert not asyncio.run(allow_all_auth("   "))


def test_user_file_auth(tmp_path):
    path = tmp_path / "users.txt"
    path.write_text("# users\nalice:alice@example.com\nbob\n")
    auth = UserFileAuth(str(path))
    assert asyncio.run(auth("alice"))
    assert asyncio.run(auth("bob"))
    assert not asyncio.run(auth("mallory"))
    assert not asyncio.run(auth(""))
    # file update picked up without restart
    path.write_text("carol\n")
    assert asyncio.run(auth("carol"))
    assert not asyncio.run(auth("alice"))


def test_user_file_auth_fails_closed(tmp_path):
    auth = UserFileAuth(str(tmp_path / "missing.txt"))
    assert not asyncio.run(auth("alice"))


def test_http_auth_rejects_url_unsafe_ids():
    """HTTPAuth must never interpolate path-navigating ids into the URL
    (the reference's SQL lookup was parameterized, embedding_gen.py:296-304)."""
    import asyncio

    from sqe_tpu.serving.auth import HTTPAuth

    auth = HTTPAuth("http://127.0.0.1:1")  # unreachable: safe ids fail closed
    for bad in ("x/../valid", "a/b", "x?admin=1", "x#y", "..", "a b", ""):
        assert asyncio.run(auth(bad)) is False

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

"""Secret-encryption-at-rest semantics (port of the reference's
EncryptionServiceTests): round-trips, PWENC prefixing, idempotent
encrypt-on-load config rewrites, wrong-key failure mode, and
decrypt-on-load through the config loader."""

import json

import pytest

pytest.importorskip("cryptography")

from trignis_spark.config import load_environment_json
from trignis_spark.crypto import (
    ENCRYPTED_HEADER,
    DecryptionError,
    EncryptionService,
)


@pytest.fixture
def svc(tmp_path):
    return EncryptionService(str(tmp_path), passphrase="test-key")


def test_round_trip_and_prefix(svc):
    token = svc.encrypt("Server=db;Password=hunter2")
    assert token.startswith(ENCRYPTED_HEADER)
    assert svc.is_encrypted(token) and not svc.is_encrypted("plain")
    assert svc.decrypt(token) == "Server=db;Password=hunter2"


def test_decrypt_passthrough_for_plaintext(svc):
    assert svc.decrypt("not encrypted") == "not encrypted"


def test_same_salt_different_service_instances_interoperate(tmp_path):
    a = EncryptionService(str(tmp_path), passphrase="k")
    b = EncryptionService(str(tmp_path), passphrase="k")
    assert b.decrypt(a.encrypt("x")) == "x"


def test_wrong_key_raises_helpful_error(tmp_path):
    a = EncryptionService(str(tmp_path), passphrase="right")
    token = a.encrypt("secret")
    b = EncryptionService(str(tmp_path), passphrase="wrong")
    with pytest.raises(DecryptionError, match=".core"):
        b.decrypt(token)


def test_encrypt_config_files_rewrites_only_sensitive_values(svc, tmp_path):
    env_dir = tmp_path / "environments"
    env_dir.mkdir()
    cfg = {
        "name": "prod",
        "tracking_objects": [{"name": "obj", "table_name": "t"}],
        "destinations": [
            {
                "name": "hook",
                "kind": "http",
                "options": {
                    "url": "https://example.test/x",
                    "basic_user": "svc",
                    "basic_password": "plaintext-pw",
                    "api_key": "${ENV:MY_KEY}",
                },
            }
        ],
    }
    (env_dir / "prod.json").write_text(json.dumps(cfg))
    rewritten = svc.encrypt_config_files(str(env_dir))
    assert rewritten == [str(env_dir / "prod.json")]
    on_disk = json.loads((env_dir / "prod.json").read_text())
    opts = on_disk["destinations"][0]["options"]
    assert opts["basic_password"].startswith(ENCRYPTED_HEADER)  # encrypted
    assert opts["url"] == "https://example.test/x"  # non-sensitive untouched
    assert opts["basic_user"] == "svc"  # username is not a secret
    assert opts["api_key"] == "${ENV:MY_KEY}"  # env placeholder left alone
    assert svc.decrypt(opts["basic_password"]) == "plaintext-pw"
    # second pass is a no-op (idempotent encrypt-on-load)
    assert svc.encrypt_config_files(str(env_dir)) == []


def test_loader_decrypts_pwenc_values(svc):
    cfg = {
        "name": "prod",
        "tracking_objects": [{"name": "obj", "table_name": "t"}],
        "destinations": [
            {
                "name": "hook",
                "kind": "http",
                "options": {
                    "url": "https://example.test/x",
                    "bearer_token": svc.encrypt("tok-123"),
                },
            }
        ],
    }
    env = load_environment_json(json.dumps(cfg), crypto=svc)
    assert env.destinations[0].options["bearer_token"] == "tok-123"
    # without the service the token stays opaque (no accidental decrypt)
    env2 = load_environment_json(json.dumps(cfg))
    assert env2.destinations[0].options["bearer_token"].startswith(
        ENCRYPTED_HEADER
    )

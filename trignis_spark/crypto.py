"""Secret encryption at rest — ``PWENC:``-prefixed config credentials.

Re-expresses ``Source/Services/EncryptionService.cs`` (PWENC-prefix
encrypt-on-load of connection strings / auth secrets, invoked at startup
by ``Program.cs:78-82``) on Python primitives:

- Fernet (AES-128-CBC + HMAC-SHA256, from the ``cryptography`` package)
  replaces the reference's RSA-wrapped-AES hybrid — same
  authenticated-encryption guarantee, one fewer key to manage;
- the symmetric key is derived from a passphrase
  (``TRIGNIS_SPARK_ENCRYPTION_KEY`` env var, warning fallback like the
  reference) via PBKDF2-HMAC-SHA256 over a per-install random salt
  persisted under ``<root>/.core/`` (the analog of the reference's
  generated keypair: change the passphrase and decryption fails with an
  error telling you to delete ``.core`` to re-key);
- ``encrypt_config_files`` walks ``environments/*.json`` and encrypts
  any *sensitive* plaintext value in place (encrypt-on-first-load:
  a config file with inline credentials is rewritten so the plaintext
  never persists past the first startup); values already ``PWENC:`` or
  ``${ENV:...}`` placeholders are left alone;
- decryption happens transparently in ``load_environment_json`` when a
  service is supplied.
"""

from __future__ import annotations

import base64
import json
import logging
import os

try:
    from cryptography.fernet import Fernet, InvalidToken
    from cryptography.hazmat.primitives.hashes import SHA256
    from cryptography.hazmat.primitives.kdf.pbkdf2 import PBKDF2HMAC
except ImportError:  # pragma: no cover - cryptography is present in CI
    Fernet = None

log = logging.getLogger("trignis_spark.crypto")

ENCRYPTED_HEADER = "PWENC:"
KEY_ENV_VAR = "TRIGNIS_SPARK_ENCRYPTION_KEY"
#: Fallback passphrase — only used when no env var is set, with a loud
#: warning (EncryptionService.cs:20,66-68 does the same).
_FALLBACK_PASSPHRASE = "trignis-spark-fallback-key-change-me"
_PBKDF2_ITERATIONS = 600_000

#: Config keys whose string values are secrets (the reference encrypts
#: ConnectionStrings + endpoint Auth/MessageQueue credentials,
#: EncryptionService.cs:264-341).
SENSITIVE_KEYS = frozenset(
    {
        "password",
        "basic_password",
        "bearer_token",
        "api_key",
        "oauth2_client_secret",
        "connection_string",
        "sasl_password",
        "access_key",
        "secret_key",
    }
)


class DecryptionError(RuntimeError):
    pass


class EncryptionService:
    """Symmetric encrypt/decrypt with a persisted per-install salt."""

    def __init__(self, root_path: str, passphrase: str | None = None):
        if Fernet is None:  # pragma: no cover
            raise RuntimeError(
                "the 'cryptography' package is required for PWENC secrets"
            )
        self.root = root_path
        if passphrase is None:
            passphrase = os.environ.get(KEY_ENV_VAR)
            if passphrase is None:
                log.warning(
                    "No %s found in the environment. Using the fallback key — "
                    "encrypted secrets are NOT protected against anyone who "
                    "can read this source tree.",
                    KEY_ENV_VAR,
                )
                passphrase = _FALLBACK_PASSPHRASE
        self._fernet = Fernet(self._derive_key(passphrase))

    def _derive_key(self, passphrase: str) -> bytes:
        core = os.path.join(self.root, ".core")
        os.makedirs(core, exist_ok=True)
        salt_path = os.path.join(core, "salt")
        if os.path.exists(salt_path):
            with open(salt_path, "rb") as f:
                salt = f.read()
        else:
            salt = os.urandom(16)
            with open(salt_path, "wb") as f:
                f.write(salt)
            log.info("Generated new encryption salt at %s", salt_path)
        kdf = PBKDF2HMAC(
            algorithm=SHA256(), length=32, salt=salt,
            iterations=_PBKDF2_ITERATIONS,
        )
        return base64.urlsafe_b64encode(kdf.derive(passphrase.encode("utf-8")))

    # -- core ---------------------------------------------------------------

    @staticmethod
    def is_encrypted(content: str) -> bool:
        return isinstance(content, str) and content.startswith(ENCRYPTED_HEADER)

    def encrypt(self, plaintext: str) -> str:
        token = self._fernet.encrypt(plaintext.encode("utf-8"))
        return ENCRYPTED_HEADER + token.decode("ascii")

    def decrypt(self, content: str) -> str:
        """Decrypt a ``PWENC:`` value; non-prefixed content passes through
        untouched (so loaders can call this on every string)."""
        if not self.is_encrypted(content):
            return content
        token = content[len(ENCRYPTED_HEADER):].encode("ascii")
        try:
            return self._fernet.decrypt(token).decode("utf-8")
        except InvalidToken as e:
            raise DecryptionError(
                f"Failed to decrypt a PWENC secret. If you changed "
                f"{KEY_ENV_VAR}, delete the .core folder under "
                f"{self.root!r} and re-encrypt your config files."
            ) from e

    # -- config-tree walking -----------------------------------------------

    def _needs_encryption(self, key: str, value) -> bool:
        return (
            key.lower() in SENSITIVE_KEYS
            and isinstance(value, str)
            and value != ""
            and not self.is_encrypted(value)
            and not value.startswith("${ENV:")
        )

    def encrypt_tree(self, node) -> tuple[object, bool]:
        """Encrypt sensitive values in a parsed JSON tree. Returns
        (new tree, changed?)."""
        changed = False
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if self._needs_encryption(k, v):
                    out[k] = self.encrypt(v)
                    changed = True
                else:
                    out[k], sub = self.encrypt_tree(v)
                    changed = changed or sub
            return out, changed
        if isinstance(node, list):
            items = [self.encrypt_tree(v) for v in node]
            return [i[0] for i in items], any(i[1] for i in items)
        return node, False

    def decrypt_tree(self, node):
        """Decrypt every ``PWENC:`` string in a parsed JSON tree."""
        if isinstance(node, dict):
            return {k: self.decrypt_tree(v) for k, v in node.items()}
        if isinstance(node, list):
            return [self.decrypt_tree(v) for v in node]
        if isinstance(node, str):
            return self.decrypt(node)
        return node

    def encrypt_config_files(self, env_dir: str) -> list[str]:
        """Encrypt-on-load: rewrite any ``environments/*.json`` whose
        sensitive fields are still plaintext (``Program.cs:78-82`` runs
        this before anything else reads the configs). Returns the list
        of rewritten files. Idempotent — already-encrypted files are
        untouched."""
        if not os.path.isdir(env_dir):
            return []
        rewritten = []
        for name in sorted(os.listdir(env_dir)):
            if not name.endswith(".json"):
                continue
            path = os.path.join(env_dir, name)
            try:
                with open(path, encoding="utf-8") as f:
                    tree = json.load(f)
            except (OSError, json.JSONDecodeError) as e:
                log.error("Cannot parse %s for secret encryption: %s", path, e)
                continue
            new_tree, changed = self.encrypt_tree(tree)
            if changed:
                with open(path, "w", encoding="utf-8") as f:
                    json.dump(new_tree, f, indent=2)
                rewritten.append(path)
                log.warning(
                    "Encrypted plaintext secrets in %s (PWENC at-rest)", path
                )
        return rewritten

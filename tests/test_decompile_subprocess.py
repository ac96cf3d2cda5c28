"""U1 subprocess decompiler runner: timeout-kill, retry cap, abi.json parse
(reference semantics: src/utils/decompile.rs:14-65 + the <=10-attempt
bookkeeping of src/extraction/extract.rs:184-245). Exercised with fake
binaries — no heimdall in the container, and none needed: the contract under
test is the process wrapper, not the decompiler."""

from __future__ import annotations

import json
import os
import stat
import time

import pytest

from eth2dgraph_spark.functions.decompile import (
    DecompilationError,
    parse_abi_json,
    subprocess_decompiler,
)

SAMPLE_ABI = [
    {
        "type": "function",
        "name": "transfer",
        "inputs": [{"type": "address"}, {"type": "uint256"}],
        "outputs": [{"type": "bool"}],
    },
    {"type": "event", "name": "Transfer", "inputs": [{"type": "address"}]},
    {"type": "constructor", "inputs": []},  # no signature -> dropped
]


def _script(tmp_path, name: str, body: str) -> list[str]:
    p = tmp_path / name
    p.write_text("#!/bin/sh\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return [str(p), "{bytecode}", "{output_dir}"]


def test_success_parses_abi(tmp_path):
    cmd = _script(
        tmp_path,
        "ok.sh",
        f"echo '{json.dumps(SAMPLE_ABI)}' > \"$2/abi.json\"\n",
    )
    impl = subprocess_decompiler(cmd, timeout_ms=2000, max_retries=3)
    rows = impl("0x6001")
    assert rows == [
        {"type": "function", "name": "transfer", "inputs": "address,uint256", "outputs": "bool"},
        {"type": "event", "name": "Transfer", "inputs": "address", "outputs": None},
    ]
    assert impl.stats["attempts"] == 1


def test_timeout_kills_and_retries(tmp_path):
    cmd = _script(tmp_path, "slow.sh", "sleep 30\n")
    impl = subprocess_decompiler(cmd, timeout_ms=200, max_retries=2)
    t0 = time.time()
    with pytest.raises(DecompilationError) as exc:
        impl("0x6001")
    # 2 attempts x 200 ms, each KILLED at the deadline — nowhere near 30 s
    assert time.time() - t0 < 5
    assert exc.value.kind == "Timeout"
    assert impl.stats == {"attempts": 2, "timeouts": 2, "failures": 0}


def test_flaky_succeeds_within_retry_cap(tmp_path):
    marker = tmp_path / "count"
    cmd = _script(
        tmp_path,
        "flaky.sh",
        # fail (no abi.json) twice, succeed on the third attempt
        f"""n=$(cat {marker} 2>/dev/null || echo 0)
n=$((n+1)); echo $n > {marker}
[ $n -lt 3 ] && exit 1
echo '{json.dumps(SAMPLE_ABI)}' > "$2/abi.json"
""",
    )
    impl = subprocess_decompiler(cmd, timeout_ms=2000, max_retries=10)
    rows = impl("0x6001")
    assert rows[0]["name"] == "transfer"
    assert impl.stats["attempts"] == 3
    assert impl.stats["failures"] == 2  # FailedToReadABI on the first two


def test_retry_cap_gives_up(tmp_path):
    cmd = _script(tmp_path, "bad.sh", "exit 1\n")
    impl = subprocess_decompiler(cmd, timeout_ms=2000, max_retries=4)
    with pytest.raises(DecompilationError) as exc:
        impl("0xdead")
    assert exc.value.kind == "FailedToReadABI"
    assert impl.stats["attempts"] == 4


def test_malformed_abi_is_parse_failure(tmp_path):
    cmd = _script(tmp_path, "garbage.sh", "echo 'not json' > \"$2/abi.json\"\n")
    impl = subprocess_decompiler(cmd, timeout_ms=2000, max_retries=2)
    with pytest.raises(DecompilationError) as exc:
        impl("0x6001")
    assert exc.value.kind == "FailedToParseABI"


def test_parse_failure_is_terminal_not_retried(tmp_path):
    # a parse failure is deterministic — the retry budget must NOT be spent
    # re-running the tool to fail identically (up to retries x timeout of
    # blocked executor core otherwise)
    cmd = _script(tmp_path, "garbage.sh", "echo 'not json' > \"$2/abi.json\"\n")
    impl = subprocess_decompiler(cmd, timeout_ms=2000, max_retries=10)
    with pytest.raises(DecompilationError) as exc:
        impl("0x6001")
    assert exc.value.kind == "FailedToParseABI"
    assert impl.stats["attempts"] == 1  # gave up on first parse failure


def test_workdir_cleaned_up(tmp_path):
    out_dirs = tmp_path / "seen"
    cmd = _script(
        tmp_path,
        "record.sh",
        f"echo \"$2\" >> {out_dirs}\necho '[]' > \"$2/abi.json\"\n",
    )
    impl = subprocess_decompiler(cmd, timeout_ms=2000, max_retries=1)
    assert impl("0x6001") == []
    recorded = out_dirs.read_text().strip().splitlines()
    assert recorded and not os.path.exists(recorded[0])  # always removed


def test_empty_bytecode_short_circuits(tmp_path):
    impl = subprocess_decompiler([str(tmp_path / "never.sh")], max_retries=1)
    assert impl(None) == []
    assert impl("") == []
    assert impl.stats["attempts"] == 0


def test_parse_abi_json_rejects_non_array():
    with pytest.raises(ValueError):
        parse_abi_json('{"type": "function"}')


def test_missing_binary_is_environment_error_not_data(tmp_path):
    # a binary that can't be spawned is an env misconfiguration: it must
    # raise (fail the task) — swallowed into per-row None it would mark
    # every skeleton failed_decompilation=true and 'succeed'
    import pytest

    from eth2dgraph_spark.functions.decompile import (
        DecompilerEnvironmentError,
        subprocess_decompiler,
    )

    impl = subprocess_decompiler(cmd=[str(tmp_path / "no-such-binary"), "{bytecode}", "{output_dir}"])
    with pytest.raises(DecompilerEnvironmentError, match="spawn failed"):
        impl("0x6001")

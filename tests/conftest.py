import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_protobuf_runtime() -> None:
    """Make ``google.protobuf`` importable when no installed copy exists,
    so the Spark-4 state-v2 path (transformWithStateInPandas — its
    driver/worker handshake is protobuf-serialized) actually EXECUTES in
    this container instead of auto-skipping (r13 verdict #5).

    Strategy: if the real package is absent, expose a pure-Python
    protobuf runtime already present on the machine (the gcloud SDK
    ships one under its appengine platform dir) through a shim dir
    containing ONLY a ``google`` symlink — never the SDK's whole
    platform tree, which carries dozens of other top-level modules that
    would shadow real imports. Runs at conftest import, BEFORE any
    SparkSession exists: the JVM inherits os.environ at launch and
    passes PYTHONPATH on to every forked Python worker, which is where
    the protobuf handshake actually runs. The fallback runtime may be
    one minor version behind pyspark's gencode (6.32 vs 6.33 — wire
    format is stable across that), so the documented
    TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK escape hatch is set in
    fallback mode only; a real installed protobuf short-circuits all of
    this."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    candidates = [
        "/usr/lib/google-cloud-sdk/platform/google_appengine",
    ]
    for root in candidates:
        if not os.path.isfile(
            os.path.join(root, "google", "protobuf", "__init__.py")
        ):
            continue
        shim = os.path.join(
            os.environ.get("TMPDIR", "/tmp"), "spark_graft_pb_shim"
        )
        os.makedirs(shim, exist_ok=True)
        link = os.path.join(shim, "google")
        target = os.path.join(root, "google")
        if os.path.islink(link):
            if os.readlink(link) != target:
                os.remove(link)
                os.symlink(target, link)
        elif not os.path.exists(link):
            os.symlink(target, link)
        sys.path.append(shim)
        os.environ["PYTHONPATH"] = (
            os.environ["PYTHONPATH"] + os.pathsep + shim
            if os.environ.get("PYTHONPATH")
            else shim
        )
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            sys.path.remove(shim)
        else:
            if not _fallback_major_matches_gencode():
                # r14 ADVICE: the escape hatch must not mask a GENUINE
                # incompatibility — if the fallback runtime's major
                # version differs from the major pyspark's gencode was
                # built against, undo the shim entirely (state-v2 tests
                # then skip instead of running on a broken runtime).
                sys.path.remove(shim)
                os.environ["PYTHONPATH"] = os.pathsep.join(
                    p
                    for p in os.environ["PYTHONPATH"].split(os.pathsep)
                    if p != shim
                )
                del os.environ[
                    "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
                ]
                for mod in [
                    m for m in sys.modules if m.startswith("google")
                ]:
                    del sys.modules[mod]
            return


def _fallback_major_matches_gencode() -> bool:
    """True when the shimmed runtime's protobuf MAJOR version equals the
    major that pyspark's generated pb2 modules validate against (read
    textually from the gencode — importing it would trip the very check
    the env var disables). Wire format is stable across minors, so the
    minor-version skew the escape hatch exists for (6.32 runtime vs 6.33
    gencode) passes; a major skew does not. Defensive: unknown layout or
    unparseable gencode -> True (prior behavior)."""
    import glob
    import re

    try:
        import google.protobuf as gp
        import pyspark

        runtime_major = int(gp.__version__.split(".")[0])
        pb2s = glob.glob(
            os.path.join(
                os.path.dirname(pyspark.__file__),
                "sql",
                "streaming",
                "proto",
                "*_pb2.py",
            )
        )
        if not pb2s:
            return True
        with open(pb2s[0]) as fh:
            m = re.search(
                r"ValidateProtobufRuntimeVersion\(\s*[^,]+,\s*(\d+),",
                fh.read(),
            )
        return m is None or int(m.group(1)) == runtime_major
    except Exception:
        return True


_ensure_protobuf_runtime()


@pytest.fixture(scope="session")
def spark():
    from practicum2_nof1_adhd_bd_spark.session import get_spark

    s = get_spark(
        "engine-tests",
        master="local[4]",
        **{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

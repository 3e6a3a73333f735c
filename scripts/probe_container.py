#!/usr/bin/env python
"""Round-start container probe (VERDICT round-3 action #6).

Checks, in one place, every optional capability that would change an
engine decision if it ever appeared in the container:

- PIL / cv2 / imageio        -> replace multimodal.decode_stub with real image decode
- soundfile / librosa        -> real audio decode/resample in mm_audio_* lanes
- astropy                    -> swap sources/fitslike.py reader for astropy.io.fits
                                (keep our reader as the streaming-tail path)
- google.protobuf            -> enable transformWithStateInPandas state ops
- avro / fastavro / spark-avro datasource -> add an Avro ingest lane next to ORC
- lsst / MySQLdb             -> reference-stack parity checks (never expected)

Writes PROBES.md at the repo root (committed each round) and prints it.
Run:  python scripts/probe_container.py
"""

from __future__ import annotations

import datetime
import importlib
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PY_MODULES = [
    "PIL",
    "cv2",
    "imageio",
    "soundfile",
    "librosa",
    "astropy",
    "google.protobuf",
    "avro",
    "fastavro",
    "lsst",
    "MySQLdb",
]


def probe_python() -> list[tuple[str, str]]:
    out = []
    for mod in PY_MODULES:
        try:
            m = importlib.import_module(mod)
            ver = getattr(m, "__version__", "present")
            out.append((mod, f"OK ({ver})"))
        except Exception:
            out.append((mod, "absent"))
    return out


def probe_spark_avro() -> str:
    """Check whether the spark-avro datasource jar is on the classpath.

    The write target is a fresh temp dir (removed afterwards) and the
    save uses overwrite mode — a leftover path from a prior run must
    never make a present datasource misreport as absent.
    """
    code = (
        "import shutil, tempfile\n"
        "from pyspark.sql import SparkSession\n"
        "s = (SparkSession.builder.master('local[1]')"
        ".config('spark.ui.enabled','false').getOrCreate())\n"
        "d = tempfile.mkdtemp(prefix='avro_probe_')\n"
        "try:\n"
        "    s.range(1).write.format('avro').mode('overwrite').save(d + '/t')\n"
        "    print('AVRO_OK')\n"
        "except Exception as e:\n"
        "    print('AVRO_ABSENT:' + type(e).__name__)\n"
        "finally:\n"
        "    shutil.rmtree(d, ignore_errors=True)\n"
        "s.stop()\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
        )
        for line in (r.stdout + r.stderr).splitlines():
            if line.startswith("AVRO_"):
                return "OK" if line == "AVRO_OK" else "absent (" + line.split(":", 1)[1] + ")"
    except Exception as e:  # pragma: no cover - defensive
        return f"probe error ({type(e).__name__})"
    return "absent (no signal)"


def main() -> int:
    rows = probe_python()
    avro_ds = probe_spark_avro()
    today = datetime.date.today().isoformat()
    lines = [
        "# PROBES — optional container capabilities",
        "",
        f"Last refreshed: {today} (`python scripts/probe_container.py`).",
        "",
        "| capability | status | engine consequence |",
        "|---|---|---|",
    ]
    consequence = {
        "PIL": "real image decode for multimodal.decode_stub",
        "cv2": "real video frame decode for mm_frame_sample",
        "imageio": "alternate image/video decode path",
        "soundfile": "real audio decode for mm_audio_resample_meta",
        "librosa": "audio feature extraction",
        "astropy": "swap fitslike reader to astropy.io.fits",
        "google.protobuf": "enable transformWithStateInPandas",
        "avro": "Avro python codec for ingest lane",
        "fastavro": "Avro python codec for ingest lane",
        "lsst": "reference-stack parity checks",
        "MySQLdb": "reference transport parity checks",
    }
    for mod, status in rows:
        lines.append(f"| `{mod}` | {status} | {consequence[mod]} |")
    lines.append(f"| spark `avro` datasource | {avro_ds} | Avro read/write lane next to ORC |")
    lines += [
        "",
        "While every row is `absent`, the documented stand-ins stay in place:",
        "`operators/multimodal.py::decode_stub` (deterministic fake decode),",
        "`sources/fitslike.py` (our own conforming FITS binary-table reader),",
        "`applyInPandasWithState` (instead of transformWithStateInPandas), and",
        "ORC (instead of Avro) for the columnar-roundtrip lane.",
        "",
    ]
    text = "\n".join(lines)
    (REPO / "PROBES.md").write_text(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Write the published JSON Schemas to schemas/*.json.

Reference parity: /root/reference/scripts/gen_json_schema.py — one
draft-2020-12 file per public model, deterministic output (sorted keys,
trailing newline). Run after model changes:

    python scripts/gen_json_schema.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exstruct_ray.schemas import model_schemas  # noqa: E402


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "schemas",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, schema in sorted(model_schemas().items()):
        path = os.path.join(out_dir, f"{name}.json")
        with open(path, "w") as f:
            json.dump(schema, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

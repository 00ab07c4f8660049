#!/usr/bin/env python3
"""Reference-protocol source plugin: emits N rows (option 'n', default
3) of (i, i*i) across two receive() polls, then EOS (empty result),
matching plugins/source.py's poll-until-empty convention."""
import json
import sys

state = {"n": 3, "emitted": False}


def handle(method, param):
    if method == "set_option":
        if param["name"].lower() == "n":
            state["n"] = int(param["value"])
        return ""
    if method in ("set_sources", "set_destinations", "set_input_columns"):
        return ""
    if method == "get_output_columns":
        return {"": ["i", "sq"]}
    if method == "receive":
        if state["emitted"]:
            return {}
        state["emitted"] = True
        return {"rows": [{"data": [i, i * i]} for i in range(state["n"])]}
    raise ValueError(f"unknown method {method}")


for line in sys.stdin:
    req = json.loads(line)
    try:
        result = handle(req["method"], req["params"][0] if req["params"] else None)
        resp = {"id": req["id"], "result": result, "error": None}
    except Exception as e:
        resp = {"id": req["id"], "result": None, "error": str(e)}
    sys.stdout.write(json.dumps(resp) + "\n")
    sys.stdout.flush()

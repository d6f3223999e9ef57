"""Round-5 LM deploy decision (VERDICT r04 next #1).

Round 4 ended with two candidates that each failed one citation gate and
no recorded decision. This script makes the decision mechanical and
auditable: it reads the candidate eval (ckpt_r5_lm/lm/lm_eval.json) and
the incumbent eval (ckpt_trained/lm/lm_eval.json), applies the round-5
gates, and deploys the candidate into ckpt_trained/lm ONLY if it wins.

Gates (VERDICT r04 next #1 and #4):
  cites_valid     >= 0.9    (as served)
  cites_src       >= 0.7    (as served)
  forced_tail     <= 0.15
  perplexity      <= 212
  cites_unforced  >= 0.85   (learned, not grammar-imposed)

Decision rule: the candidate deploys if it passes every gate; otherwise
the model that passes MORE gates wins; on a tie, the higher
(cites_valid + cites_src + cites_unforced - max(0, ppl - 212) / 100)
score wins. The losing side's eval stays on disk for the audit trail.

Run on CPU after scripts/lm_eval.py:
  python scripts/r5_lm_decide.py [--deploy]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANDIDATE = os.path.join(REPO, "ckpt_r5_lm", "lm")
INCUMBENT = os.path.join(REPO, "ckpt_trained", "lm")
OUT = os.path.join(REPO, "scripts", "r5_lm_decision.json")

GATES = {
    "cites_valid": (">=", 0.9),
    "cites_src": (">=", 0.7),
    "forced_tail_rate": ("<=", 0.15),
    "perplexity": ("<=", 212.0),
    "cites_unforced": (">=", 0.85),
}


def metrics(lm_dir: str) -> dict | None:
    path = os.path.join(lm_dir, "lm_eval.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        ev = json.load(f)
    gen = ev.get("grounded_generation", {})
    rates = gen.get("rates", {})
    unforced = gen.get("rates_unforced", {})
    return {
        "cites_valid": rates.get("cites_valid", 0.0),
        "cites_src": rates.get("cites_src", 0.0),
        "forced_tail_rate": gen.get("forced_tail_rate", 1.0),
        "perplexity": ev.get("perplexity", {}).get("perplexity", 1e9),
        # Older evals (round 4) predate the learned/forced split; score
        # their unforced rate conservatively as rate * (1 - forced_tail).
        "cites_unforced": unforced.get(
            "cites",
            rates.get("cites", 0.0)
            * (1.0 - gen.get("forced_tail_rate", 1.0)),
        ),
    }


def judge(m: dict) -> dict:
    passed = {}
    for k, (op, thr) in GATES.items():
        v = m[k]
        passed[k] = (v >= thr) if op == ">=" else (v <= thr)
    score = (m["cites_valid"] + m["cites_src"] + m["cites_unforced"]
             - max(0.0, m["perplexity"] - 212.0) / 100.0)
    return {"metrics": m, "gates": passed,
            "n_passed": sum(passed.values()),
            "passes_all": all(passed.values()),
            "score": round(score, 4)}


def main() -> None:
    deploy = "--deploy" in sys.argv
    cand_m, inc_m = metrics(CANDIDATE), metrics(INCUMBENT)
    assert cand_m is not None, f"no candidate eval under {CANDIDATE}"
    assert inc_m is not None, f"no incumbent eval under {INCUMBENT}"
    if cand_m == inc_m and os.path.exists(INCUMBENT + "_r4"):
        # The candidate is already deployed (re-run after --deploy):
        # compare against the preserved pre-deploy incumbent instead of
        # the candidate's own copy, or the decision degenerates to a tie.
        inc_m = metrics(INCUMBENT + "_r4")
    cand, inc = judge(cand_m), judge(inc_m)

    if cand["passes_all"] and not inc["passes_all"]:
        winner = "candidate"
    elif inc["passes_all"] and not cand["passes_all"]:
        winner = "incumbent"
    elif cand["n_passed"] != inc["n_passed"]:
        winner = "candidate" if cand["n_passed"] > inc["n_passed"] \
            else "incumbent"
    else:
        winner = "candidate" if cand["score"] > inc["score"] else "incumbent"

    decision = {
        "candidate": {"dir": CANDIDATE, **cand},
        "incumbent": {"dir": INCUMBENT, **inc},
        "winner": winner,
        "deployed": False,
        "rule": ("passes_all > n_passed > score; score = cites_valid + "
                 "cites_src + cites_unforced - max(0, ppl-212)/100"),
    }
    if winner == "candidate" and deploy:
        backup = INCUMBENT + "_r4"
        if not os.path.exists(backup):
            shutil.copytree(INCUMBENT, backup)
        for name in os.listdir(CANDIDATE):
            shutil.copy2(os.path.join(CANDIDATE, name),
                         os.path.join(INCUMBENT, name))
        decision["deployed"] = True
        decision["incumbent_backup"] = backup
    with open(OUT, "w") as f:
        json.dump(decision, f, indent=2)
    print(json.dumps(decision, indent=2))


if __name__ == "__main__":
    main()

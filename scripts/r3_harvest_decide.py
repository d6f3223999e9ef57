"""Compare the round-3 candidate embedder against the deployed one.

Reads the two same-session eval artifacts written by r3_tpu_queue.sh and
prints a deployment recommendation. Decision rule: the serving workload is
natural-language questions over the WHOLE corpus, so question_full acc@1 is
primary; span acc is a guard against catastrophic regression of the
verbatim-query mode (still a real user behavior).
"""

import json
import sys

NEW = "scripts/r3_b1024_eval.json"
OLD = "scripts/r3_deployed_eval.json"


def main() -> None:
    new = json.load(open(NEW))
    old = json.load(open(OLD))

    def row(r, key):
        s = r.get(key, {})
        return s.get("acc@1", float("nan")), s.get("acc@5", float("nan"))

    print(f"{'metric':<16}{'deployed':>12}{'candidate':>12}")
    for key in ("span", "question", "span_full", "question_full"):
        (o1, o5), (n1, n5) = row(old, key), row(new, key)
        print(f"{key:<16}{o1:>12.4f}{n1:>12.4f}   (acc@5 {o5:.3f} -> {n5:.3f})")

    o_q = old.get("question_full", old["question"])["acc@1"]
    n_q = new.get("question_full", new["question"])["acc@1"]
    o_s = old["span"]["acc@1"]
    n_s = new["span"]["acc@1"]
    deploy = n_q >= o_q + 0.01 and n_s >= o_s - 0.05
    print()
    if deploy:
        print("RECOMMEND: deploy the candidate")
        print("  cp ckpt_r3_b1024/model.npz ckpt_r3_b1024/model_manifest.json"
              " ckpt_r3_b1024/tokenizer.json ckpt_trained/")
        print("  python -m sqe_tpu build-index --corpus_dir=/root/reference/PMC"
              " --checkpoint_dir=ckpt_trained")
    else:
        print("RECOMMEND: keep the deployed model (candidate did not clear"
              " the question_full +0.01 / span -0.05 gate)")
    sys.exit(0 if deploy else 1)


if __name__ == "__main__":
    main()

"""Compare the round-4 candidate embedder against the deployed one.

Reads the two same-session eval artifacts written by r4g_queue.sh and
prints a deployment recommendation. Decision rule (same as round 3,
scripts/r3_harvest_decide.py): the serving workload is natural-language
questions over the WHOLE corpus, so question_full acc@1 is primary; span
acc guards against catastrophic regression of the verbatim-query mode.
"""

import json

NEW = "scripts/r4_hardft3_eval.json"
OLD = "scripts/r4_deployed_eval.json"


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
        print("  cp ckpt_r4_hardft3/model.npz ckpt_r4_hardft3/model_manifest.json"
              " ckpt_r4_hardft3/tokenizer.json ckpt_trained/")
        print("  python -m sqe_tpu build-index --corpus_dir=/root/reference/PMC"
              " --checkpoint_dir=ckpt_trained")
    else:
        print("RECOMMEND: keep the deployed model "
              f"(question_full {o_q:.4f} -> {n_q:.4f}, span {o_s:.4f} -> {n_s:.4f})")


if __name__ == "__main__":
    main()

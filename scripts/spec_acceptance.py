"""Realistic speculative-decode acceptance measurement (round-4, PERF.md).

spec_bench.py brackets prompt-lookup decoding between a full-acceptance
ceiling and a force-rejected floor; this script measures the EXPECTED case.
Greedy prompt-lookup acceptance is a pure function of the token stream:
at each verify the drafts come from `propose_ngram` over (prompt + emitted
so far), and the accepted count is the longest draft prefix that equals the
true greedy continuation, plus one bonus token.  So teacher-forcing a real
(prompt, answer) pair through the REAL drafting code reproduces the exact
per-verify emit counts a TPU run would see — no model forward needed, and
the numbers transfer because the verify-forward cost was measured separately
(spec_bench: a K-wide verify costs ~= one decode step on TPU; PERF.md floor
row).  Expected speedup = mean(tokens emitted per verify) x t_plain/t_verify.

Prompt styles mirror the serving workloads (eval/datasets.py adapters):
  mcq        — Video-MME/MLVU option strings, 1-5 token letter answers;
  extractive — SRT subtitle QA whose answer quotes subtitle spans;
  caption    — dense recaption with recurring entities (LVCoT segments);
  freeform   — abstractive answer sharing only stopwords with the prompt.

Usage: python scripts/spec_acceptance.py [window ...]   (defaults 4 8)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np


def tokenize(text, vocab):
    ids = []
    for w in text.replace("\n", " \n ").split(" "):
        if not w:
            continue
        if w not in vocab:
            vocab[w] = len(vocab) + 10
        ids.append(vocab[w])
    return ids


SUBS = """
00:01 the chef places a pan on the stove and pours olive oil
00:07 she dices an onion on the wooden board
00:15 the onion goes into the pan and she stirs with a spatula
00:24 a clove of garlic is crushed and added to the pan
00:33 she pours the tomato sauce over the onion and garlic
00:41 the sauce simmers while she fills a pot with water
00:52 pasta goes into the boiling water
01:03 she tastes the sauce and adds salt and pepper
01:14 the pasta is drained and tossed into the sauce
01:22 she plates the pasta and grates cheese on top
""".strip()

CASES = {
    "mcq": (
        "Question : what does the chef add to the pan after the onion ?\n"
        "Options :\n( A ) a clove of garlic\n( B ) the cheese\n"
        "( C ) the pasta\n( D ) salt and pepper\n"
        "Respond with only the letter of the correct option .",
        "( A ) a clove of garlic",
    ),
    "extractive": (
        "These are the subtitles of the video :\n" + SUBS + "\n"
        "Question : what happens right after the pasta is drained ?",
        "the pasta is drained and tossed into the sauce , then she plates "
        "the pasta and grates cheese on top",
    ),
    "caption": (
        "Previous segment summary : the chef places a pan on the stove , "
        "dices an onion , and stirs the onion in the pan with a spatula .\n"
        "Describe what happens in this segment of the video .",
        "the chef crushes a clove of garlic and adds it to the pan , then "
        "pours tomato sauce over the onion and garlic , and the sauce "
        "simmers in the pan while she fills a pot with water . the chef "
        "stirs the sauce with the spatula the way she stirred the onion .",
    ),
    "freeform": (
        "Question : judge the mood of this cooking video in your own words .",
        "overall it feels calm and homely , with unhurried movements and a "
        "warm kitchen atmosphere that suggests an experienced home cook "
        "enjoying a familiar recipe rather than racing a clock .",
    ),
}


def simulate(prompt_ids, answer_ids, window, ngram=3):
    """Teacher-forced PLD loop: returns per-verify emit counts (exact)."""
    import jax.numpy as jnp

    from tdc_video_tpu.serving.speculative import propose_ngram

    Lp, A = len(prompt_ids), len(answer_ids)
    C = Lp + A + 1
    hist = np.zeros((1, C), np.int32)
    hist[0, :Lp] = prompt_ids
    hist[0, Lp] = answer_ids[0]  # first token comes from prefill
    hist_len, ne, emits = Lp + 1, 1, []
    while ne < A:
        draft, _ = propose_ngram(
            jnp.asarray(hist), jnp.asarray([hist_len]), ngram, window - 1
        )
        draft = np.asarray(draft)[0]
        # greedy at window position j predicts the token after the window
        # prefix [last, d_0..d_{j-1}]: g_j == answer[ne+j] while the drafts
        # agree, and agree[j] = (g_j == d_j) — so d_j is checked against
        # answer[ne+j]; acceptance = longest agreeing prefix + 1 bonus
        m = 1
        for j in range(window - 1):
            if ne + j >= A or draft[j] != answer_ids[ne + j]:
                break
            m += 1
        m = min(m, A - ne)
        for j in range(m):
            hist[0, hist_len + j] = answer_ids[ne + j]
        hist_len += m
        ne += m
        emits.append(m)
    return emits


def main():
    windows = [int(w) for w in sys.argv[1:]] or [4, 8]
    vocab = {}
    print(f"{'style':<11s} {'ans tok':>7s} " +
          " ".join(f"w={w}: tok/verify (speedup)" for w in windows))
    rows = {}
    for name, (prompt, answer) in CASES.items():
        p, a = tokenize(prompt, vocab), tokenize(answer, vocab)
        cols = []
        for w in windows:
            emits = simulate(p, a, w)
            tpv = (sum(emits) / len(emits)) if emits else 1.0
            cols.append(f"w={w}: {tpv:4.2f} ({tpv:4.2f}x)")
            rows.setdefault(name, {})[w] = tpv
        print(f"{name:<11s} {len(a):>7d} " + "  ".join(cols))
    # expected speedup assumes t_verify ~= t_plain (measured on TPU:
    # spec_bench floor == 1.0x plain; PERF.md round-3 spec table)
    print("\nexpected-case speedup = tokens/verify (verify forward ~= "
          "decode step on TPU; floor row, PERF.md)")
    mean = {w: np.mean([rows[n][w] for n in rows]) for w in windows}
    print("mean over styles: " +
          ", ".join(f"w={w}: {mean[w]:.2f}x" for w in windows))


if __name__ == "__main__":
    main()

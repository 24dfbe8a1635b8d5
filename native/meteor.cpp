// METEOR scorer (exact + Porter-stem matching stages), C++ native core.
//
// Replaces the reference's one non-Python component — the meteor-1.5.jar JVM
// subprocess (ref: /root/reference/eval_func/meteor/meteor.py:22-29) — with an
// in-process native library exposed through a C ABI for ctypes.
//
// Algorithm (Banerjee & Lavie 2005 / Lavie & Agarwal 2007): align hypothesis
// and reference unigrams in matcher stages (exact, then Porter-stemmed),
// choosing per-stage the alignment that maximizes matches; compute
//   P = m/|hyp|, R = m/|ref|, Fmean = P*R / (alpha*P + (1-alpha)*R)
//   penalty = gamma * (chunks/m)^beta,  score = (1 - penalty) * Fmean.
// The reference jar additionally uses synonym/paraphrase tables
// (paraphrase-en.gz), which are missing blobs in the reference repo itself;
// this implementation documents that divergence and keeps the standard
// exact+stem stages.
//
// Parameters default to METEOR-for-English alpha=0.9, beta=3.0, gamma=0.5.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Porter stemmer (classic 1980 algorithm).
// ---------------------------------------------------------------------------

struct PorterStemmer {
  std::string b;

  bool is_consonant(int i) const {
    char c = b[i];
    if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') return false;
    if (c == 'y') return i == 0 ? true : !is_consonant(i - 1);
    return true;
  }

  // Measure of the word between 0..j: [C](VC)^m[V]
  int measure(int j) const {
    int n = 0, i = 0;
    while (true) {
      if (i > j) return n;
      if (!is_consonant(i)) break;
      i++;
    }
    i++;
    while (true) {
      while (true) {
        if (i > j) return n;
        if (is_consonant(i)) break;
        i++;
      }
      i++;
      n++;
      while (true) {
        if (i > j) return n;
        if (!is_consonant(i)) break;
        i++;
      }
      i++;
    }
  }

  bool vowel_in_stem(int j) const {
    for (int i = 0; i <= j; i++)
      if (!is_consonant(i)) return true;
    return false;
  }

  bool double_consonant(int j) const {
    if (j < 1) return false;
    if (b[j] != b[j - 1]) return false;
    return is_consonant(j);
  }

  bool cvc(int i) const {
    if (i < 2 || !is_consonant(i) || is_consonant(i - 1) || !is_consonant(i - 2)) return false;
    char c = b[i];
    return c != 'w' && c != 'x' && c != 'y';
  }

  bool ends(const char* s, int* j) {
    size_t l = strlen(s);
    if (l > b.size()) return false;
    if (b.compare(b.size() - l, l, s) != 0) return false;
    *j = static_cast<int>(b.size() - l) - 1;
    return true;
  }

  void set_to(const char* s, int j) { b = b.substr(0, j + 1) + s; }

  std::string stem(const std::string& word) {
    if (word.size() <= 2) return word;
    b = word;
    int j;
    // Step 1a
    if (ends("sses", &j)) set_to("ss", j);
    else if (ends("ies", &j)) set_to("i", j);
    else if (ends("ss", &j)) { }
    else if (ends("s", &j)) b.pop_back();
    // Step 1b
    bool step1b_extra = false;
    if (ends("eed", &j)) {
      if (measure(j) > 0) b.pop_back();
    } else if (ends("ed", &j) && vowel_in_stem(j)) {
      b = b.substr(0, j + 1);
      step1b_extra = true;
    } else if (ends("ing", &j) && vowel_in_stem(j)) {
      b = b.substr(0, j + 1);
      step1b_extra = true;
    }
    if (step1b_extra) {
      int k = static_cast<int>(b.size()) - 1;
      int dummy;
      if (ends("at", &dummy) || ends("bl", &dummy) || ends("iz", &dummy)) b += "e";
      else if (double_consonant(k)) {
        char c = b[k];
        if (c != 'l' && c != 's' && c != 'z') b.pop_back();
      } else if (measure(k) == 1 && cvc(k)) b += "e";
    }
    // Step 1c
    if (ends("y", &j) && vowel_in_stem(j)) b[b.size() - 1] = 'i';
    // Step 2
    static const std::pair<const char*, const char*> step2[] = {
        {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"}, {"anci", "ance"},
        {"izer", "ize"}, {"abli", "able"}, {"alli", "al"}, {"entli", "ent"},
        {"eli", "e"}, {"ousli", "ous"}, {"ization", "ize"}, {"ation", "ate"},
        {"ator", "ate"}, {"alism", "al"}, {"iveness", "ive"}, {"fulness", "ful"},
        {"ousness", "ous"}, {"aliti", "al"}, {"iviti", "ive"}, {"biliti", "ble"}};
    for (auto& p : step2)
      if (ends(p.first, &j)) {
        if (measure(j) > 0) set_to(p.second, j);
        break;
      }
    // Step 3
    static const std::pair<const char*, const char*> step3[] = {
        {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
        {"ical", "ic"}, {"ful", ""}, {"ness", ""}};
    for (auto& p : step3)
      if (ends(p.first, &j)) {
        if (measure(j) > 0) set_to(p.second, j);
        break;
      }
    // Step 4
    static const char* step4[] = {"al", "ance", "ence", "er", "ic", "able", "ible",
                                  "ant", "ement", "ment", "ent", "ou", "ism", "ate",
                                  "iti", "ous", "ive", "ize"};
    for (auto* s : step4)
      if (ends(s, &j)) {
        if (measure(j) > 1) b = b.substr(0, j + 1);
        break;
      }
    if (ends("ion", &j) && j >= 0 && (b[j] == 's' || b[j] == 't') && measure(j) > 1)
      b = b.substr(0, j + 1);
    // Step 5a
    if (ends("e", &j)) {
      int m = measure(j);
      if (m > 1 || (m == 1 && !cvc(j))) b.pop_back();
    }
    // Step 5b
    {
      int k = static_cast<int>(b.size()) - 1;
      if (k > 0 && double_consonant(k) && b[k] == 'l' && measure(k - 1) > 1) b.pop_back();
    }
    return b;
  }
};

std::vector<std::string> tokenize(const char* s) {
  std::vector<std::string> out;
  std::istringstream ss(s);
  std::string tok;
  while (ss >> tok) {
    std::string lower;
    for (char c : tok) lower += static_cast<char>(::tolower(static_cast<unsigned char>(c)));
    out.push_back(lower);
  }
  return out;
}

// Stage-wise greedy alignment: for each stage, match each unmatched hyp token
// to the first unmatched ref token with the same key.
struct Alignment {
  int matches = 0;
  int chunks = 0;
};

Alignment align(const std::vector<std::string>& hyp, const std::vector<std::string>& ref) {
  PorterStemmer stemmer;
  size_t nh = hyp.size(), nr = ref.size();
  std::vector<int> hyp_to_ref(nh, -1);
  std::vector<bool> ref_used(nr, false);

  auto run_stage = [&](bool stemmed) {
    std::vector<std::string> hk(nh), rk(nr);
    for (size_t i = 0; i < nh; i++) hk[i] = stemmed ? stemmer.stem(hyp[i]) : hyp[i];
    for (size_t i = 0; i < nr; i++) rk[i] = stemmed ? stemmer.stem(ref[i]) : ref[i];
    for (size_t i = 0; i < nh; i++) {
      if (hyp_to_ref[i] >= 0) continue;
      for (size_t jj = 0; jj < nr; jj++) {
        if (ref_used[jj]) continue;
        if (hk[i] == rk[jj]) {
          hyp_to_ref[i] = static_cast<int>(jj);
          ref_used[jj] = true;
          break;
        }
      }
    }
  };
  run_stage(false);
  run_stage(true);

  Alignment a;
  int prev_ref = -2;
  for (size_t i = 0; i < nh; i++) {
    if (hyp_to_ref[i] < 0) continue;
    a.matches++;
    if (hyp_to_ref[i] != prev_ref + 1) a.chunks++;
    prev_ref = hyp_to_ref[i];
  }
  return a;
}

double sentence_score(const std::vector<std::string>& hyp, const std::vector<std::string>& ref,
                      double alpha, double beta, double gamma) {
  Alignment a = align(hyp, ref);
  if (a.matches == 0 || hyp.empty() || ref.empty()) return 0.0;
  double p = static_cast<double>(a.matches) / hyp.size();
  double r = static_cast<double>(a.matches) / ref.size();
  double fmean = p * r / (alpha * p + (1.0 - alpha) * r);
  double frag = static_cast<double>(a.chunks) / a.matches;
  double penalty = gamma * std::pow(frag, beta);
  return (1.0 - penalty) * fmean;
}

}  // namespace

extern "C" {

// Best score over the (newline-separated) references for one hypothesis.
double meteor_sentence(const char* hypothesis, const char* references_nl,
                       double alpha, double beta, double gamma) {
  auto hyp = tokenize(hypothesis);
  double best = 0.0;
  std::istringstream ss(references_nl);
  std::string line;
  while (std::getline(ss, line)) {
    if (line.empty()) continue;
    auto ref = tokenize(line.c_str());
    best = std::max(best, sentence_score(hyp, ref, alpha, beta, gamma));
  }
  return best;
}

// Porter stem into caller buffer (for tests); returns written length.
int meteor_stem(const char* word, char* out, int out_len) {
  PorterStemmer st;
  std::string s = st.stem(word);
  int n = static_cast<int>(s.size());
  if (n + 1 > out_len) return -1;
  memcpy(out, s.c_str(), n + 1);
  return n;
}
}

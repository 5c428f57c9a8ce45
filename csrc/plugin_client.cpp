/* plugin_client — a standalone C++ program exercising the C ABI plug-in
 * boundary (lattisense_plugin.h), the way a real SEAL/Lattigo
 * application would: it owns ONLY raw-RNS C structs read from fixture
 * files, links only liblattisense_plugin.so, and never touches a Python
 * type. Mirrors the reference plug-in test shape
 * (plug-in/SEAL/test_acc/test_bfv_gpu.cpp: foreign types -> C structs ->
 * runner -> C structs).
 *
 * Usage: plugin_client <task_dir> <fixture_dir> <out_ct_file>
 * Fixture binary formats are defined by tools/plugin_fixture.py.
 * Exit 0 + "CLIENT OK" on success (negative signature tests asserted
 * along the way).
 */
#include "lattisense_plugin.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Blob {
    std::vector<uint64_t> words;   /* backing store for all coefficients */
};

uint32_t rd_u32(FILE* f) {
    uint32_t v = 0;
    if (fread(&v, 4, 1, f) != 1) { fprintf(stderr, "short read\n"); exit(3); }
    return v;
}

FILE* open_or_die(const std::string& p) {
    FILE* f = fopen(p.c_str(), "rb");
    if (!f) { fprintf(stderr, "cannot open %s\n", p.c_str()); exit(3); }
    return f;
}

/* layout helpers: build CPolynomial[] over a flat word buffer */
CPolynomial* make_polys(uint64_t* base, int n_poly, int n_comp, int n,
                        std::vector<CComponent>& comps) {
    auto* polys = new CPolynomial[n_poly];
    size_t c0 = comps.size();
    comps.resize(c0 + (size_t)n_poly * n_comp);
    for (int j = 0; j < n_poly; j++) {
        for (int i = 0; i < n_comp; i++) {
            comps[c0 + (size_t)j * n_comp + i] =
                CComponent{n, base + ((size_t)j * n_comp + i) * n};
        }
        polys[j] = CPolynomial{n_comp, comps.data() + c0 + (size_t)j * n_comp};
    }
    return polys;
}

CCiphertext load_ct(const std::string& path, Blob& blob,
                    std::vector<CComponent>& comps) {
    FILE* f = open_or_die(path);
    if (rd_u32(f) != 0x4354534CU) { fprintf(stderr, "bad ct magic\n"); exit(3); }
    int level = (int)rd_u32(f), degree = (int)rd_u32(f);
    int n_comp = (int)rd_u32(f), n = (int)rd_u32(f);
    size_t cnt = (size_t)(degree + 1) * n_comp * n;
    size_t off = blob.words.size();
    blob.words.resize(off + cnt);
    if (fread(blob.words.data() + off, 8, cnt, f) != cnt) exit(3);
    fclose(f);
    CCiphertext ct;
    ct.level = level;
    ct.degree = degree;
    ct.polys = make_polys(blob.words.data() + off, degree + 1, n_comp, n,
                          comps);
    return ct;
}

CKeySwitchKey load_ksk(const std::string& path, Blob& blob,
                       std::vector<CComponent>& comps) {
    FILE* f = open_or_die(path);
    if (rd_u32(f) != 0x4B54534CU) { fprintf(stderr, "bad key magic\n"); exit(3); }
    int npk = (int)rd_u32(f), level = (int)rd_u32(f);
    int n_comp = (int)rd_u32(f), n = (int)rd_u32(f);
    auto* pks = new CPublicKey[npk];
    for (int k = 0; k < npk; k++) {
        size_t cnt = (size_t)2 * n_comp * n;
        size_t off = blob.words.size();
        blob.words.resize(off + cnt);
        if (fread(blob.words.data() + off, 8, cnt, f) != cnt) exit(3);
        pks[k].level = level;
        pks[k].degree = 1;
        pks[k].polys = make_polys(blob.words.data() + off, 2, n_comp, n,
                                  comps);
    }
    fclose(f);
    return CKeySwitchKey{npk, pks};
}

CGaloisKey load_glk(const std::string& path, Blob& blob,
                    std::vector<CComponent>& comps,
                    std::vector<uint64_t>& elems) {
    FILE* f = open_or_die(path);
    if (rd_u32(f) != 0x4754534CU) { fprintf(stderr, "bad glk magic\n"); exit(3); }
    int nk = (int)rd_u32(f), npk = (int)rd_u32(f), level = (int)rd_u32(f);
    int n_comp = (int)rd_u32(f), n = (int)rd_u32(f);
    auto* ksks = new CKeySwitchKey[nk];
    size_t e0 = elems.size();
    elems.resize(e0 + nk);
    for (int g = 0; g < nk; g++) {
        if (fread(elems.data() + e0 + g, 8, 1, f) != 1) exit(3);
        auto* pks = new CPublicKey[npk];
        for (int k = 0; k < npk; k++) {
            size_t cnt = (size_t)2 * n_comp * n;
            size_t off = blob.words.size();
            blob.words.resize(off + cnt);
            if (fread(blob.words.data() + off, 8, cnt, f) != cnt) exit(3);
            pks[k].level = level;
            pks[k].degree = 1;
            pks[k].polys = make_polys(blob.words.data() + off, 2, n_comp, n,
                                      comps);
        }
        ksks[g] = CKeySwitchKey{npk, pks};
    }
    fclose(f);
    return CGaloisKey{nk, elems.data() + e0, ksks};
}

void write_ct(const std::string& path, const CCiphertext* ct) {
    FILE* f = fopen(path.c_str(), "wb");
    if (!f) { fprintf(stderr, "cannot write %s\n", path.c_str()); exit(3); }
    uint32_t magic = 0x4354534CU;
    uint32_t level = (uint32_t)ct->level, degree = (uint32_t)ct->degree;
    uint32_t n_comp = (uint32_t)ct->polys[0].n_component;
    uint32_t n = (uint32_t)ct->polys[0].components[0].n;
    fwrite(&magic, 4, 1, f);
    fwrite(&level, 4, 1, f);
    fwrite(&degree, 4, 1, f);
    fwrite(&n_comp, 4, 1, f);
    fwrite(&n, 4, 1, f);
    for (int j = 0; j <= ct->degree; j++) {
        for (int i = 0; i < (int)n_comp; i++) {
            fwrite(ct->polys[j].components[i].data, 8, n, f);
        }
    }
    fclose(f);
}

void expect_contains(const char* msg, const char* needle) {
    if (!msg || !strstr(msg, needle)) {
        fprintf(stderr, "FAIL: error message %s\n  does not contain: %s\n",
                msg ? msg : "(null)", needle);
        exit(4);
    }
}

}  // namespace

int main(int argc, char** argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s <task_dir> <fixture_dir> <out_ct>\n",
                argv[0]);
        return 2;
    }
    std::string task_dir = argv[1], fx = argv[2], out_path = argv[3];

    Blob blob;
    blob.words.reserve(1 << 22);
    std::vector<CComponent> comps;
    comps.reserve(4096);
    std::vector<uint64_t> gal_elems;

    CCiphertext x = load_ct(fx + "/x.ct", blob, comps);
    CCiphertext y = load_ct(fx + "/y.ct", blob, comps);
    CCiphertext x_bad = load_ct(fx + "/x_badlevel.ct", blob, comps);
    CKeySwitchKey rlk = load_ksk(fx + "/rlk.key", blob, comps);
    CGaloisKey glk = load_glk(fx + "/glk.key", blob, comps, gal_elems);

    fhe_task_handle task = create_fhe_tpu_task(task_dir.c_str());
    if (!task) {
        fprintf(stderr, "create failed: %s\n", lst_last_error(nullptr));
        return 5;
    }

    void* x_elems[1] = {&x};
    void* y_elems[1] = {&y};
    void* bad_elems[1] = {&x_bad};
    void* rlk_elems[1] = {&rlk};
    void* glk_elems[1] = {&glk};

    CArgument out_args[1];
    memset(out_args, 0, sizeof(out_args));
    out_args[0].id = "w";

    /* negative: wrong level -> verbatim reference signature error */
    {
        CArgument ins[4] = {
            {"x", TYPE_CIPHERTEXT, bad_elems, x_bad.level, 1},
            {"y", TYPE_CIPHERTEXT, y_elems, y.level, 1},
            {"rlk", TYPE_RELIN_KEY, rlk_elems, rlk.public_keys[0].level, 1},
            {"glk", TYPE_GALOIS_KEY, glk_elems, 0, 1},
        };
        int rc = run_fhe_tpu_task(task, ins, 4, out_args, 1, 0);
        if (rc == 0) { fprintf(stderr, "FAIL: bad level accepted\n"); return 4; }
        expect_contains(lst_last_error(task), "expected level is");
        printf("negative wrong-level: OK (%s)\n", lst_last_error(task));
    }
    /* negative: swapped ids */
    {
        CArgument ins[4] = {
            {"y", TYPE_CIPHERTEXT, y_elems, y.level, 1},
            {"x", TYPE_CIPHERTEXT, x_elems, x.level, 1},
            {"rlk", TYPE_RELIN_KEY, rlk_elems, rlk.public_keys[0].level, 1},
            {"glk", TYPE_GALOIS_KEY, glk_elems, 0, 1},
        };
        int rc = run_fhe_tpu_task(task, ins, 4, out_args, 1, 0);
        if (rc == 0) { fprintf(stderr, "FAIL: swapped ids accepted\n"); return 4; }
        expect_contains(lst_last_error(task), "expected id is");
        printf("negative swapped-id: OK\n");
    }
    /* positive run */
    {
        CArgument ins[4] = {
            {"x", TYPE_CIPHERTEXT, x_elems, x.level, 1},
            {"y", TYPE_CIPHERTEXT, y_elems, y.level, 1},
            {"rlk", TYPE_RELIN_KEY, rlk_elems, rlk.public_keys[0].level, 1},
            {"glk", TYPE_GALOIS_KEY, glk_elems, 0, 1},
        };
        int rc = run_fhe_tpu_task(task, ins, 4, out_args, 1, 0);
        if (rc != 0) {
            fprintf(stderr, "run failed: %s\n", lst_last_error(task));
            return 5;
        }
        const CCiphertext* w =
            (const CCiphertext*)((void**)out_args[0].data)[0];
        write_ct(out_path, w);
        printf("positive run: OK (out level %d degree %d)\n", w->level,
               w->degree);
    }
    release_fhe_tpu_task(task);
    printf("CLIENT OK\n");
    return 0;
}

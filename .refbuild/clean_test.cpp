// Probe harness for the reference's clean_or_clip_poly (wagyu
// snap-round union), the byte oracle for core/polyclean and
// core/wagyu.  One input per stdin line, two accepted spellings:
//   "x,y x,y ...; x,y ..."   rings separated by ';' (op=1 first point,
//                            op=2 rest — tests/test_polyclean.py)
//   "op,x,y op,x,y ..."      explicit drawvec tokens
// Result printed as "op,x,y" tokens on one line.
// Built against the reference sources copied into .refbuild/src.
#include <cstdio>
#include <string>
#include <sstream>
#include <iostream>
#include "geometry.hpp"
#include "main.hpp"
#include "options.hpp"

// globals normally defined in main.cpp (not linked here)
int geometry_scale = 0;
int prevent[256];
int additional[256];
std::vector<clipbbox> clipbboxes;
size_t max_tile_features = 200000;

// stubs for serial.hpp readers referenced by decode_geometry (unused here)
#include <atomic>
#include "serial.hpp"
int deserialize_byte_io(FILE *, signed char *, std::atomic<long long> *) { return 0; }
int deserialize_long_long_io(FILE *, long long *, std::atomic<long long> *) { return 0; }

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        drawvec dv;
        bool ring_start = true;
        std::istringstream ss(line);
        std::string tok;
        while (ss >> tok) {
            // a ';' (optionally glued to the previous token) starts a new ring
            size_t semi;
            while ((semi = tok.find(';')) != std::string::npos) {
                std::string head = tok.substr(0, semi);
                if (!head.empty()) {
                    long long x, y;
                    if (sscanf(head.c_str(), "%lld,%lld", &x, &y) == 2) {
                        dv.push_back(draw(ring_start ? 1 : 2, x, y));
                        ring_start = false;
                    }
                }
                tok = tok.substr(semi + 1);
                ring_start = true;
            }
            if (tok.empty()) continue;
            int op; long long x, y, z;
            if (sscanf(tok.c_str(), "%lld,%lld,%lld", &x, &y, &z) == 3) {
                op = (int)x;
                dv.push_back(draw(op, y, z));
                ring_start = false;
            } else if (sscanf(tok.c_str(), "%lld,%lld", &x, &y) == 2) {
                dv.push_back(draw(ring_start ? 1 : 2, x, y));
                ring_start = false;
            }
        }
        drawvec out = clean_or_clip_poly(dv, 0, 0, false);
        std::string sep = "";
        for (auto &d : out) {
            printf("%s%d,%lld,%lld", sep.c_str(), (int)d.op,
                   (long long)d.x, (long long)d.y);
            sep = " ";
        }
        printf("\n");
        fflush(stdout);
    }
    return 0;
}

// Fixture-driven Go client: the Go twin of csrc/plugin_client.cpp.
//
// usage: runtask <task_dir> <fixture_dir> <out_ct>
//
// Reads the binary fixtures written by tools/plugin_fixture.py
// (x.ct / y.ct / x_badlevel.ct / rlk.key / glk.key), asserts the
// verbatim wrong-level signature error through BOTH the Go pre-flight
// and the native runner, then runs the task (mult_relin + rotate) and
// writes the output ciphertext for the Python side to decrypt-compare.
package main

import (
	"encoding/binary"
	"fmt"
	"os"
	"strings"

	lattisense "github.com/lattisense/lattisense-tpu/plugin/go/lattisense"
)

const (
	ctMagic  = 0x4354534C
	kskMagic = 0x4B54534C
	glkMagic = 0x4754534C
)

type reader struct {
	buf []byte
	off int
}

func (r *reader) u32() uint32 {
	v := binary.LittleEndian.Uint32(r.buf[r.off:])
	r.off += 4
	return v
}

func (r *reader) u64() uint64 {
	v := binary.LittleEndian.Uint64(r.buf[r.off:])
	r.off += 8
	return v
}

func (r *reader) rows(nComp, n int) [][]uint64 {
	out := make([][]uint64, nComp)
	for i := range out {
		row := make([]uint64, n)
		for j := range row {
			row[j] = r.u64()
		}
		out[i] = row
	}
	return out
}

func open(path string) *reader {
	buf, err := os.ReadFile(path)
	if err != nil {
		fmt.Fprintf(os.Stderr, "cannot open %s\n", path)
		os.Exit(3)
	}
	return &reader{buf: buf}
}

func loadCt(path string) *lattisense.Ciphertext {
	r := open(path)
	if r.u32() != ctMagic {
		fmt.Fprintln(os.Stderr, "bad ct magic")
		os.Exit(3)
	}
	level, deg := int(r.u32()), int(r.u32())
	nComp, n := int(r.u32()), int(r.u32())
	data := make([][][]uint64, deg+1)
	for j := range data {
		data[j] = r.rows(nComp, n)
	}
	return &lattisense.Ciphertext{Level: level, Data: data}
}

func loadKsk(path string) *lattisense.KeySwitchKey {
	r := open(path)
	if r.u32() != kskMagic {
		fmt.Fprintln(os.Stderr, "bad ksk magic")
		os.Exit(3)
	}
	nPk, level := int(r.u32()), int(r.u32())
	nComp, n := int(r.u32()), int(r.u32())
	k := &lattisense.KeySwitchKey{Level: level}
	for b := 0; b < nPk; b++ {
		var entry [2][][]uint64
		entry[0] = r.rows(nComp, n)
		entry[1] = r.rows(nComp, n)
		k.Keys = append(k.Keys, entry)
	}
	return k
}

func loadGlk(path string) *lattisense.GaloisKeys {
	r := open(path)
	if r.u32() != glkMagic {
		fmt.Fprintln(os.Stderr, "bad glk magic")
		os.Exit(3)
	}
	nKey, nPk := int(r.u32()), int(r.u32())
	level, nComp, n := int(r.u32()), int(r.u32()), int(r.u32())
	g := &lattisense.GaloisKeys{Level: level}
	for i := 0; i < nKey; i++ {
		g.Elements = append(g.Elements, r.u64())
		k := lattisense.KeySwitchKey{Level: level}
		for b := 0; b < nPk; b++ {
			var entry [2][][]uint64
			entry[0] = r.rows(nComp, n)
			entry[1] = r.rows(nComp, n)
			k.Keys = append(k.Keys, entry)
		}
		g.Keys = append(g.Keys, k)
	}
	return g
}

func writeCt(path string, ct *lattisense.Ciphertext) {
	f, err := os.Create(path)
	if err != nil {
		fmt.Fprintf(os.Stderr, "cannot write %s\n", path)
		os.Exit(3)
	}
	defer f.Close()
	hdr := make([]byte, 20)
	binary.LittleEndian.PutUint32(hdr[0:], ctMagic)
	binary.LittleEndian.PutUint32(hdr[4:], uint32(ct.Level))
	binary.LittleEndian.PutUint32(hdr[8:], uint32(len(ct.Data)-1))
	binary.LittleEndian.PutUint32(hdr[12:], uint32(len(ct.Data[0])))
	binary.LittleEndian.PutUint32(hdr[16:], uint32(len(ct.Data[0][0])))
	f.Write(hdr)
	row8 := make([]byte, 8)
	for _, poly := range ct.Data {
		for _, row := range poly {
			for _, w := range row {
				binary.LittleEndian.PutUint64(row8, w)
				f.Write(row8)
			}
		}
	}
}

func main() {
	if len(os.Args) != 4 {
		fmt.Fprintf(os.Stderr, "usage: %s <task_dir> <fixture_dir> <out_ct>\n",
			os.Args[0])
		os.Exit(2)
	}
	taskDir, fx, outPath := os.Args[1], os.Args[2], os.Args[3]

	x := loadCt(fx + "/x.ct")
	y := loadCt(fx + "/y.ct")
	xBad := loadCt(fx + "/x_badlevel.ct")
	rlk := loadKsk(fx + "/rlk.key")
	glk := loadGlk(fx + "/glk.key")

	task, err := lattisense.NewFheTaskTpu(taskDir)
	if err != nil {
		fmt.Fprintf(os.Stderr, "create failed: %v\n", err)
		os.Exit(5)
	}
	defer task.Release()

	arg := func(id string, t lattisense.DataType, lv int,
		v interface{}) lattisense.Argument {
		return lattisense.Argument{ID: id, Type: t, Level: lv,
			Values: []interface{}{v}}
	}

	// negative path: wrong level must yield the verbatim reference error
	out := []*lattisense.Argument{{ID: "w", Type: lattisense.TypeCiphertext}}
	err = task.Run([]lattisense.Argument{
		arg("x", lattisense.TypeCiphertext, xBad.Level, xBad),
		arg("y", lattisense.TypeCiphertext, y.Level, y),
		arg("rlk", lattisense.TypeRelinKey, rlk.Level, rlk),
		arg("glk", lattisense.TypeGaloisKey, glk.Level, glk),
	}, out, 0)
	if err == nil || !strings.Contains(err.Error(), "expected level is") {
		fmt.Fprintf(os.Stderr, "negative path: wanted verbatim level error, got %v\n", err)
		os.Exit(6)
	}

	// positive path
	err = task.Run([]lattisense.Argument{
		arg("x", lattisense.TypeCiphertext, x.Level, x),
		arg("y", lattisense.TypeCiphertext, y.Level, y),
		arg("rlk", lattisense.TypeRelinKey, rlk.Level, rlk),
		arg("glk", lattisense.TypeGaloisKey, glk.Level, glk),
	}, out, 0)
	if err != nil {
		fmt.Fprintf(os.Stderr, "run failed: %v\n", err)
		os.Exit(7)
	}
	writeCt(outPath, out[0].Values[0].(*lattisense.Ciphertext))
	fmt.Println("go plugin client OK")
}

// Package lattisense lets native Go applications (e.g. Lattigo users) run
// LattiSense-TPU compiled tasks on raw-RNS data, mirroring the reference
// Lattigo plug-in (plug-in/lattigo/acc/gpu_runner.go): load a task
// directory, marshal Go-side ciphertexts/keys into the C ABI structs, and
// invoke the runner through liblattisense_plugin.so.
//
// Layering (same as the reference adapter):
//
//	check_sig.go  — Go-side pre-flight validation, verbatim error strings
//	argument.go   — raw-RNS Go types <-> C structs (c_struct_import_export)
//	task.go       — cgo task lifecycle (create / run / release)
//	lattigo_adapter.go (build tag "lattigo") — Lattigo rlwe types -> raw RNS
//
// Build: `make -C ../../csrc plugin` first (produces
// liblattisense_plugin.so), then `go build ./...` here. The Go toolchain
// is not present in the CI image — tests/test_plugin_go.py gates on it.
package lattisense

/*
#cgo CFLAGS: -I${SRCDIR}/../../../csrc
#cgo LDFLAGS: -L${SRCDIR}/../../../csrc -llattisense_plugin -Wl,-rpath,${SRCDIR}/../../../csrc

#include <stdlib.h>
#include "lattisense_plugin.h"
*/
import "C"

import (
	"encoding/json"
	"fmt"
	"os"
	"path/filepath"
	"unsafe"
)

// FheTaskTpu is the Go handle to one compiled task directory
// (mega_ag.json + task_signature.json), the analog of the reference's
// acc.FheTaskGpu.
type FheTaskTpu struct {
	handle    C.fhe_task_handle
	Signature map[string]interface{}
	Parameter map[string]interface{}
}

// NewFheTaskTpu loads a compiled task directory.
func NewFheTaskTpu(projectPath string) (*FheTaskTpu, error) {
	if _, err := os.Stat(projectPath); os.IsNotExist(err) {
		return nil, fmt.Errorf("%s not exists", projectPath)
	}
	t := new(FheTaskTpu)
	sigRaw, err := os.ReadFile(filepath.Join(projectPath, "task_signature.json"))
	if err != nil {
		return nil, err
	}
	if err := json.Unmarshal(sigRaw, &t.Signature); err != nil {
		return nil, err
	}
	agRaw, err := os.ReadFile(filepath.Join(projectPath, "mega_ag.json"))
	if err != nil {
		return nil, err
	}
	var ag map[string]interface{}
	if err := json.Unmarshal(agRaw, &ag); err != nil {
		return nil, err
	}
	if p, ok := ag["parameter"].(map[string]interface{}); ok {
		t.Parameter = p
	}
	cpath := C.CString(projectPath)
	defer C.free(unsafe.Pointer(cpath))
	t.handle = C.create_fhe_tpu_task(cpath)
	if t.handle == nil {
		return nil, fmt.Errorf("create_fhe_tpu_task: %s",
			C.GoString(C.lst_last_error(nil)))
	}
	return t, nil
}

// Run executes the task. Inputs are data arguments in signature order
// followed by key arguments (rlk / glk as required by the key
// signature); outputs are filled with freshly imported ciphertexts.
// mfNbits mirrors the reference Montgomery-form exchange control
// (0 = plain NTT/coefficient residues).
func (t *FheTaskTpu) Run(inputs []Argument, outputs []*Argument, mfNbits int) error {
	if t.handle == nil {
		return fmt.Errorf("task released")
	}
	if err := t.CheckSignatures(inputs); err != nil {
		return err
	}
	ins, pinInputs := exportArguments(inputs)
	defer pinInputs.free()
	outs, pinOutputs := exportOutputArguments(outputs)
	defer pinOutputs.free()

	rc := C.run_fhe_tpu_task(t.handle,
		(*C.CArgument)(unsafe.Pointer(&ins[0])), C.uint64_t(len(ins)),
		(*C.CArgument)(unsafe.Pointer(&outs[0])), C.uint64_t(len(outs)),
		C.int(mfNbits))
	if rc != 0 {
		return fmt.Errorf("%s", C.GoString(C.lst_last_error(t.handle)))
	}
	for i, out := range outputs {
		out.Values = importOutput(&outs[i])
	}
	return nil
}

// LastError returns the runner's last error message for this handle.
func (t *FheTaskTpu) LastError() string {
	return C.GoString(C.lst_last_error(t.handle))
}

// Release frees the native task handle (and every output struct it owns).
func (t *FheTaskTpu) Release() {
	if t.handle != nil {
		C.release_fhe_tpu_task(t.handle)
		t.handle = nil
	}
}
